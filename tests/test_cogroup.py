"""N-stream co-group: one exchange, complete keys per partition."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def test_cogroup_colliding_names_and_key_completeness(ray_session):
    """Two sides sharing a column name ('v') must not collide in the
    union schema, and every key's rows from BOTH sides must land in
    the same partition (the per-partition sums equal global sums)."""
    from cex_crawler_ray.stages.cogroup import cogroup_apply

    rng = np.random.RandomState(3)
    a = pd.DataFrame(
        {"k": rng.randint(0, 50, 400), "v": rng.randint(1, 10, 400)}
    )
    b = pd.DataFrame(
        {"kk": rng.randint(0, 50, 300), "v": rng.randint(1, 10, 300)}
    )
    la = ray.data.from_pandas(a).repartition(5)
    lb = ray.data.from_pandas(b).repartition(3)

    def combine(frames):
        fa, fb = frames
        sa = fa.groupby("k", as_index=False)["v"].sum().rename(
            columns={"v": "sum_a"}
        )
        sb = fb.groupby("kk", as_index=False)["v"].sum().rename(
            columns={"kk": "k", "v": "sum_b"}
        )
        out = sa.merge(sb, on="k", how="outer").fillna(0)
        return pa.Table.from_pandas(
            out.astype("int64"), preserve_index=False
        )

    got = (
        cogroup_apply([la, lb], ["k", "kk"], combine, num_parts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want_a = a.groupby("k", as_index=False)["v"].sum().rename(
        columns={"v": "sum_a"}
    )
    want_b = b.groupby("kk", as_index=False)["v"].sum().rename(
        columns={"kk": "k", "v": "sum_b"}
    )
    want = (
        want_a.merge(want_b, on="k", how="outer")
        .fillna(0)
        .astype("int64")
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
