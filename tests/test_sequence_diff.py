"""Unit tests: interval merging, funnels, retention cohorts, table diff."""

import numpy as np
import pandas as pd
import pytest

import ray


def test_merge_intervals_running_max(ray_session):
    """An early LONG interval swallows later short ones even when the
    immediately-previous interval already ended (running-max semantics,
    not lag semantics)."""
    from cex_crawler_ray.stages.window import merge_intervals

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_id": [10, 11, 12, 13, 20],
            # long [0,100]; short [5,6]; [50,55] overlaps the LONG one
            # though the previous row ended at 6; [200,201] is a gap
            "s_us": [0, 5, 50, 200, 0],
            "e_us": [100, 6, 55, 201, 1],
        }
    )
    out = (
        merge_intervals(ray.data.from_pandas(df).repartition(3), num_parts=4)
        .to_pandas()
        .sort_values(["user_id", "island_id"])
        .reset_index(drop=True)
    )
    u1 = out[out.user_id == 1]
    assert u1["island_id"].tolist() == [1, 2]
    assert u1["island_start_us"].tolist() == [0, 200]
    assert u1["island_end_us"].tolist() == [100, 201]
    assert u1["n_events"].tolist() == [3, 1]
    u2 = out[out.user_id == 2]
    assert u2["n_events"].tolist() == [1]


def test_merge_intervals_touch_merges(ray_session):
    from cex_crawler_ray.stages.window import merge_intervals

    df = pd.DataFrame(
        {
            "user_id": [7, 7],
            "event_id": [1, 2],
            "s_us": [0, 10],
            "e_us": [10, 20],  # touching endpoints merge
        }
    )
    out = merge_intervals(ray.data.from_pandas(df), num_parts=2).to_pandas()
    assert len(out) == 1 and out["n_events"].iloc[0] == 2


def test_funnel_strict_order(ray_session):
    """A click BEFORE the first view does not count; a click at the
    exact view timestamp does not count (strictly after)."""
    from cex_crawler_ray.stages.sequence import funnel_counts

    t = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
            "event_type": [
                "view", "click", "purchase",          # full funnel
                "click", "view",                       # click too early
                "view", "click", "click",              # no purchase
            ],
            "ts": [t, t + s, t + 2 * s,
                   t, t + s,
                   t, t, t + s],                       # u3 first click AT view ts
        }
    )
    out = (
        funnel_counts(
            ray.data.from_pandas(df).repartition(3),
            ["view", "click", "purchase"],
            num_parts=4,
        )
        .to_pandas()
        .sort_values("step_idx")
        .reset_index(drop=True)
    )
    assert out["step"].tolist() == ["view", "click", "purchase"]
    # u1,u2,u3 all viewed; u1 clicked after view, u3's t+1s click counts
    assert out["n_users"].tolist() == [3, 2, 1]


def test_retention_cohorts_single_cohort_per_user(ray_session):
    from cex_crawler_ray.stages.sequence import retention_cohorts

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 09:00", "2024-01-01 23:00",  # same day twice
                    "2024-01-03 01:00",
                    "2024-01-02 05:00", "2024-01-03 06:00",
                ]
            ),
        }
    )
    out = (
        retention_cohorts(ray.data.from_pandas(df).repartition(2), num_parts=4)
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "cohort_day": ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-02"],
            "day_offset": [0, 2, 0, 1],
            "n_users": [1, 1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(
        out.astype({"day_offset": "int64", "n_users": "int64"}), want
    )


def test_table_diff_statuses(ray_session):
    from cex_crawler_ray.stages.diff import table_diff

    old = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    new = pd.DataFrame({"k": [2, 3, 4], "v": [20, 31, 40]})
    out = (
        table_diff(
            ray.data.from_pandas(old).repartition(2),
            ray.data.from_pandas(new).repartition(2),
            key_col="k",
            val_col="v",
            num_parts=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # key 2 unchanged -> dropped
    assert out["k"].tolist() == [1, 3, 4]
    assert out["status"].tolist() == ["removed", "changed", "added"]
    assert out["old_val"].tolist() == [10, 30, -1]
    assert out["new_val"].tolist() == [-1, 31, 40]


def test_merge_apply_basic(ray_session):
    """Update, delete, insert, and pass-through in one apply."""
    import pandas as pd

    import ray
    from cex_crawler_ray.stages.diff import merge_apply

    base = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    ch = pd.DataFrame(
        {"k": [2, 3, 9], "v": [99, 0, 77], "op": ["U", "D", "U"]}
    )
    out = (
        merge_apply(
            ray.data.from_pandas(base).repartition(2),
            ray.data.from_pandas(ch),
            key_col="k",
            val_col="v",
            num_parts=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 4, 9]
    assert out["v"].tolist() == [10, 99, 40, 77]


def test_merge_apply_inverts_table_diff(ray_session):
    """merge_apply(old, ops(table_diff(old, new))) == new — the CDC
    diff and its apply are exact inverses."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray
    from cex_crawler_ray.stages.diff import merge_apply, table_diff

    rng = np.random.default_rng(5)
    old = pd.DataFrame(
        {
            "k": np.arange(200, dtype=np.int64),
            "v": rng.integers(0, 50, 200).astype(np.int64),
        }
    )
    new = old.sample(150, random_state=1).copy()  # 50 removed
    new.loc[new["k"] % 3 == 0, "v"] += 1000  # some changed
    add = pd.DataFrame(
        {
            "k": np.arange(500, 530, dtype=np.int64),
            "v": np.arange(30, dtype=np.int64),
        }
    )
    new = pd.concat([new, add], ignore_index=True)

    diff = table_diff(
        ray.data.from_pandas(old).repartition(3),
        ray.data.from_pandas(new).repartition(3),
        key_col="k",
        val_col="v",
        num_parts=4,
    )

    def to_ops(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        op = np.where(df["status"] == "removed", "D", "U")
        return pa.table(
            {
                "k": pa.array(df["k"].to_numpy(np.int64), pa.int64()),
                "v": pa.array(
                    df["new_val"].to_numpy(np.int64), pa.int64()
                ),
                "op": pa.array(op.tolist(), pa.string()),
            }
        )

    ops = diff.map_batches(to_ops, batch_format="pyarrow")
    merged = (
        merge_apply(
            ray.data.from_pandas(old).repartition(3),
            ops,
            key_col="k",
            val_col="v",
            num_parts=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expect = new.sort_values("k").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(merged.astype("int64"), expect)
