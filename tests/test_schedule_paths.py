"""The politeness schedule has two implementations — driver-side
vectorized (small frontiers) and distributed groupby(host) (large) —
that must produce IDENTICAL output (pipelines/crawl.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray

from cex_crawler_ray.pipelines import crawl as crawl_mod
from cex_crawler_ray.pipelines.crawl import (
    _schedule_driver,
    _schedule_group,
    _to_table,
)


def _synthetic_frontier(n=500, hosts=7, seed=3):
    rng = np.random.RandomState(seed)
    host_ids = rng.randint(0, hosts, size=n)
    return pa.table(
        {
            "url": pa.array([f"https://h{h}.test/p{i}" for i, h in enumerate(host_ids)]),
            "host": pa.array([f"h{h}.test" for h in host_ids]),
            "url_hash": pa.array(
                rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64),
                pa.uint64(),
            ),
            "title": pa.array([""] * n),
            "priority": pa.array(
                rng.randint(0, 3, size=n).astype(np.int32), pa.int32()
            ),
            "depth": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "discovered_ts": pa.array(
                rng.randint(0, 4, size=n).astype(np.int64), pa.int64()
            ),
        }
    )


def _canon(t: pa.Table) -> list:
    order = pc.sort_indices(
        t, sort_keys=[("host", "ascending"), ("fetch_slot", "ascending")]
    )
    t = t.take(order)
    return list(
        zip(
            t["host"].to_pylist(),
            t["fetch_slot"].to_pylist(),
            t["url"].to_pylist(),
            t["scheduled"].to_pylist(),
        )
    )


def test_driver_and_distributed_schedule_agree(ray_session):
    tbl = _synthetic_frontier()
    budgets = {"h0.test": 5, "h3.test": 2}
    default_tokens = 10

    driver = _schedule_driver(tbl, budgets, default_tokens)
    dist = _to_table(
        ray.data.from_arrow(tbl)
        .groupby("host")
        .map_groups(
            lambda g: _schedule_group(g, budgets, default_tokens),
            batch_format="pyarrow",
        )
    )
    assert _canon(driver) == _canon(dist)


def test_slot_order_follows_priority_then_clock_then_hash(ray_session):
    tbl = _synthetic_frontier(n=200, hosts=3)
    out = _schedule_driver(tbl, {}, 5)
    df = out.to_pandas()
    for _, g in df.groupby("host"):
        g = g.sort_values("fetch_slot")
        keys = list(
            zip(g["priority"], g["discovered_ts"], g["url_hash"])
        )
        assert keys == sorted(keys)
        # budget: exactly the first 5 slots scheduled
        assert g["scheduled"].tolist() == [
            s < 5 for s in range(len(g))
        ]


def test_schedule_threshold_switches(ray_session, monkeypatch):
    tbl = _synthetic_frontier(n=120)
    monkeypatch.setattr(crawl_mod, "DRIVER_SCHEDULE_MAX_ROWS", 50)
    via_dist = crawl_mod._schedule(tbl, {}, 4)
    monkeypatch.setattr(crawl_mod, "DRIVER_SCHEDULE_MAX_ROWS", 10_000)
    via_driver = crawl_mod._schedule(tbl, {}, 4)
    assert _canon(via_dist) == _canon(via_driver)
