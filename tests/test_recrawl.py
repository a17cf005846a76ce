"""Recrawl scheduling: change-rate priorities (Cho & Garcia-Molina)."""

import pyarrow as pa

import ray


def _obs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "page_key": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "changed": pa.array([r[2] for r in rows], pa.bool_()),
            }
        )
    )


def test_change_rate_priorities_hand(ray_session):
    from cex_crawler_ray.stages.recrawl import change_rate_priorities

    M = 1_000_000  # one second in micros
    # page 1: 4 obs, 2 changes, last at t=100s  (now)
    # page 2: 2 obs, 0 changes, last at t=40s
    # page 3: 1 obs, 1 change,  last at t=10s
    rows = [
        (1, 10 * M, True),
        (1, 30 * M, False),
        (1, 70 * M, True),
        (1, 100 * M, False),
        (2, 20 * M, False),
        (2, 40 * M, False),
        (3, 10 * M, True),
    ]
    out = (
        change_rate_priorities(_obs(rows))
        .to_pandas()
        .sort_values("page_key")
        .reset_index(drop=True)
    )
    assert out["n_obs"].tolist() == [4, 2, 1]
    assert out["n_changes"].tolist() == [2, 0, 1]
    # now = 100s; ages 0, 60, 90
    assert out["age_s"].tolist() == [0, 60, 90]
    # priority = age * changes // obs: 0, 0, 90
    assert out["priority"].tolist() == [0, 0, 90]


def test_change_rate_priorities_partition_invariant(ray_session):
    from cex_crawler_ray.stages.recrawl import change_rate_priorities

    M = 1_000_000
    rows = [
        (k, (k * 37 + i * 11) % 500 * M, (k + i) % 3 == 0)
        for k in range(20)
        for i in range(k % 7 + 1)
    ]
    one = (
        change_rate_priorities(_obs(rows))
        .to_pandas()
        .sort_values("page_key")
        .reset_index(drop=True)
    )
    many = (
        change_rate_priorities(_obs(rows).repartition(13))
        .to_pandas()
        .sort_values("page_key")
        .reset_index(drop=True)
    )
    assert one.equals(many)
