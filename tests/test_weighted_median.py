"""Weighted histogram-descent median vs brute force."""

import numpy as np
import pandas as pd

import ray


def _brute(df):
    out = {}
    for k, g in df.groupby("k"):
        g = g.groupby("v", as_index=False)["wt"].sum().sort_values("v")
        cum = g["wt"].cumsum().to_numpy()
        t = (int(g["wt"].sum()) + 1) // 2
        out[k] = int(
            g["v"].to_numpy()[int(np.searchsorted(cum, t, side="left"))]
        )
    return out


def test_weighted_median_matches_brute_force(ray_session):
    from cex_crawler_ray.stages.sketch import exact_group_weighted_median

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 3000),
            # values straddle several 2^16 buckets and repeat a lot
            "v": rng.randint(0, 300_000, 3000).astype(np.int64),
            "wt": rng.randint(1, 20, 3000).astype(np.int64),
        }
    )
    want = _brute(df)
    for parts in (1, 4, 9):
        got = (
            exact_group_weighted_median(
                ray.data.from_pandas(df).repartition(parts),
                "k",
                "v",
                "wt",
            )
            .to_pandas()
            .set_index("k")["wmedian"]
            .to_dict()
        )
        assert got == want, parts


def test_unit_weights_equal_lower_median(ray_session):
    """wt=1 everywhere must reduce to the plain lower median."""
    from cex_crawler_ray.stages.sketch import exact_group_weighted_median

    df = pd.DataFrame(
        {
            "k": [0] * 4 + [1] * 5,
            "v": np.array([10, 20, 30, 40, 5, 6, 7, 8, 9], np.int64),
            "wt": np.ones(9, np.int64),
        }
    )
    got = (
        exact_group_weighted_median(
            ray.data.from_pandas(df).repartition(3), "k", "v", "wt"
        )
        .to_pandas()
        .set_index("k")["wmedian"]
        .to_dict()
    )
    assert got == {0: 20, 1: 7}
