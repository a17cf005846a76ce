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
