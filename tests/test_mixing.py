"""Temperature-based domain resampling."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

import ray


def _corpus(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    ).repartition(3)


ROWS = (
    [(i, "big", f"big doc number {i} with words") for i in range(100)]
    + [(200 + i, "mid", f"mid doc {i} text") for i in range(25)]
    + [(300 + i, "tiny", f"tiny {i}") for i in range(4)]
)


def test_rates_sqrt_rule(ray_session):
    from cex_crawler_ray.stages.mixing import source_rates

    t = source_rates(_corpus(ROWS)).to_pandas().set_index("source")
    assert t.loc["tiny", "rate_ppm"] == 1_000_000  # smallest keeps all
    assert t.loc["mid", "rate_ppm"] == math.floor(
        1e6 * math.sqrt(4 / 25)
    )
    assert t.loc["big", "rate_ppm"] == math.floor(1e6 * math.sqrt(4 / 100))
    assert t["n_docs"].to_dict() == {"big": 100, "mid": 25, "tiny": 4}


def test_sample_matches_rule_exactly(ray_session):
    from cex_crawler_ray.stages.mixing import (
        source_rates,
        temperature_sample,
    )

    rates = {
        r["source"]: r["rate_ppm"]
        for r in source_rates(_corpus(ROWS)).to_pylist()
    }
    got = set(temperature_sample(_corpus(ROWS)).to_pandas()["doc_id"])
    want = set()
    for d, s, t in ROWS:
        u32 = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        if u32 * 1_000_000 < rates[s] * 4_294_967_296:
            want.add(d)
    assert got == want
    assert 0 < len(got) < len(ROWS)


def test_smallest_source_fully_kept(ray_session):
    from cex_crawler_ray.stages.mixing import temperature_sample

    got = temperature_sample(_corpus(ROWS)).to_pandas()
    assert (got["source"] == "tiny").sum() == 4


def test_single_source_keeps_everything(ray_session):
    from cex_crawler_ray.stages.mixing import temperature_sample

    rows = [(i, "only", f"doc {i}") for i in range(10)]
    got = temperature_sample(_corpus(rows)).to_pandas()
    assert len(got) == 10


def test_weighted_sample_partition_invariant(ray_session):
    from cex_crawler_ray.stages.mixing import weighted_priority_sample

    rows = [(i, f"document number {i} body", 10 + (i * 7) % 90)
            for i in range(200)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    outs = []
    for parts in (1, 3, 11):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        got = weighted_priority_sample(ds, k=20)
        outs.append(list(zip(got["doc_id"].to_pylist(),
                             got["weight"].to_pylist())))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 20


def test_weighted_sample_favors_heavy_rows(ray_session):
    """Weight-proportional inclusion: rows with 100x the weight should
    dominate the sample."""
    import hashlib as _hl

    from cex_crawler_ray.stages.mixing import weighted_priority_sample

    rows = [(i, f"unique text {i}", 10000 if i < 100 else 100)
            for i in range(1000)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    ).repartition(4)
    got = weighted_priority_sample(ds, k=50)
    heavy = sum(1 for d in got["doc_id"].to_pylist() if d < 100)
    assert heavy >= 35  # 100 heavy rows at 100x weight dominate
