"""Sort-free global NTILE: remainder rule + partitioning invariance."""

import numpy as np
import pandas as pd

import ray


def _brute(df, k):
    o = df.sort_values(["cents", "event_id"]).reset_index(drop=True)
    n = len(o)
    base, rem = divmod(n, k)
    rn = np.arange(1, n + 1)
    cut = rem * (base + 1)
    t = np.where(
        rn <= cut,
        (rn - 1) // (base + 1) + 1,
        rem + (rn - 1 - cut) // max(base, 1) + 1 if base else 0,
    )
    return dict(zip(o["event_id"], t.astype(int)))


def test_ntile_remainder_rule_and_partition_invariance(ray_session):
    from cex_crawler_ray.stages.window import global_ntile

    rng = np.random.RandomState(9)
    # n = 1003, k = 7 -> uneven tiles (first 2 get 144, rest 143)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1003, dtype=np.int64),
            "cents": rng.randint(0, 5000, 1003).astype(np.int64),
        }
    )
    want = _brute(df, 7)
    for parts in (1, 4, 13):
        got = (
            global_ntile(
                ray.data.from_pandas(df).repartition(parts),
                1003,
                7,
                bucket_width=256,
            )
            .to_pandas()
            .set_index("event_id")["tile"]
            .to_dict()
        )
        assert got == want, parts


def test_ntile_more_tiles_than_rows(ray_session):
    """n < k: every row its own tile, tiles 1..n."""
    from cex_crawler_ray.stages.window import global_ntile

    df = pd.DataFrame(
        {
            "event_id": np.array([3, 1, 2], np.int64),
            "cents": np.array([30, 10, 20], np.int64),
        }
    )
    got = (
        global_ntile(ray.data.from_pandas(df), 3, 10)
        .to_pandas()
        .set_index("event_id")["tile"]
        .to_dict()
    )
    assert got == {1: 1, 2: 2, 3: 3}
