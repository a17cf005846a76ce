"""Politeness compliance audit: gap math, violations, single-fetch
hosts, tie handling, partition invariance."""

import pyarrow as pa
import pytest

import ray
from cex_crawler_ray.state.politeness import audit_fetch_gaps


def _ds(rows, nparts=None):
    tbl = pa.table(
        {
            "host": pa.array([r[0] for r in rows], pa.string()),
            "ts_s": pa.array([r[1] for r in rows], pa.int64()),
            "required_delay_s": pa.array(
                [r[2] for r in rows], pa.int64()
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(nparts) if nparts else ds


@pytest.mark.parametrize("nparts", [None, 4])
def test_gaps_and_violations(ray_session, nparts):
    rows = [
        ("a", 0, 10),
        ("a", 5, 10),    # gap 5  -> violation
        ("a", 30, 10),   # gap 25 -> ok
        ("a", 40, 10),   # gap 10 -> ok (not strict)
        ("b", 100, 5),   # single fetch: no gap
        ("c", 7, 3),
        ("c", 7, 3),     # same-second double fetch: gap 0 violation
    ]
    out = (
        audit_fetch_gaps(_ds(rows, nparts))
        .to_pandas()
        .set_index("host")
        .sort_index()
    )
    assert out.loc["a", "n_fetches"] == 4
    assert out.loc["a", "min_gap_s"] == 5
    assert out.loc["a", "n_violations"] == 1
    assert out.loc["b", "n_fetches"] == 1
    assert out.loc["b", "min_gap_s"] is None or out.loc[
        "b", "min_gap_s"
    ] != out.loc["b", "min_gap_s"]  # null / NaN
    assert out.loc["b", "n_violations"] == 0
    assert out.loc["c", "min_gap_s"] == 0
    assert out.loc["c", "n_violations"] == 1


def test_unsorted_input_order_irrelevant(ray_session):
    rows = [("x", t, 4) for t in (50, 10, 30, 20, 40)]
    out = audit_fetch_gaps(_ds(rows)).to_pandas().iloc[0]
    assert out["min_gap_s"] == 10 and out["n_violations"] == 0
