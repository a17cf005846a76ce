"""Rank-aware round capacity: _apply_round_cap + rank_hosts + e2e."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from tests.conftest import SF_TINY


def _sched_tbl(rows):
    # rows: (url, host, url_hash, priority, discovered_ts, scheduled)
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "url_hash": pa.array([r[2] for r in rows], pa.uint64()),
            "title": pa.array([""] * len(rows), pa.string()),
            "priority": pa.array([r[3] for r in rows], pa.int32()),
            "depth": pa.array([0] * len(rows), pa.int32()),
            "discovered_ts": pa.array([r[4] for r in rows], pa.int64()),
            "fetch_slot": pa.array([0] * len(rows), pa.int32()),
            "scheduled": pa.array([r[5] for r in rows], pa.bool_()),
        }
    )


def test_cap_prefers_high_rank_hosts():
    from cex_crawler_ray.pipelines.crawl import _apply_round_cap

    tbl = _sched_tbl(
        [
            ("a1", "a", 1, 0, 10, True),
            ("a2", "a", 2, 0, 11, True),
            ("b1", "b", 3, 0, 1, True),
            ("b2", "b", 4, 0, 2, True),
            ("c1", "c", 5, 0, 0, False),  # not scheduled: untouched
        ]
    )
    out = _apply_round_cap(tbl, {"b": 100, "a": 1}, cap=2)
    kept = [
        u
        for u, s in zip(out["url"].to_pylist(), out["scheduled"].to_pylist())
        if s
    ]
    assert kept == ["b1", "b2"]
    # capped-out rows remain present (deferred), never dropped
    assert out.num_rows == tbl.num_rows


def test_cap_tie_breaks_deterministically():
    from cex_crawler_ray.pipelines.crawl import _apply_round_cap

    tbl = _sched_tbl(
        [
            ("x1", "x", 9, 0, 5, True),
            ("x2", "x", 7, 0, 5, True),  # same ts: url_hash breaks tie
            ("x3", "x", 8, 1, 5, True),  # worse priority loses
        ]
    )
    out = _apply_round_cap(tbl, {}, cap=2)
    kept = {
        u
        for u, s in zip(out["url"].to_pylist(), out["scheduled"].to_pylist())
        if s
    }
    assert kept == {"x2", "x1"}


def test_cap_noop_under_capacity():
    from cex_crawler_ray.pipelines.crawl import _apply_round_cap

    tbl = _sched_tbl([("a1", "a", 1, 0, 10, True)])
    out = _apply_round_cap(tbl, {}, cap=5)
    assert out["scheduled"].to_pylist() == [True]


def test_rank_hosts_from_edges(ray_session):
    from cex_crawler_ray.pipelines.crawl import rank_hosts

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_host": pa.array(
                    ["a.test", "b.test", "c.test", "d.test"], pa.string()
                ),
                "dst_host": pa.array(
                    ["hub.test", "hub.test", "hub.test", "a.test"],
                    pa.string(),
                ),
            }
        )
    )
    ranks = rank_hosts(edges)
    # hash-keyed HostRanks: all 5 hosts present, hub the most central
    assert len(ranks) == 5
    vals = {
        h: ranks.get(h)
        for h in ("a.test", "b.test", "c.test", "d.test", "hub.test")
    }
    assert vals["hub.test"] == int(ranks.ranks.max())
    # unknown hosts rank 0 / default
    assert ranks.get("nope.test") == 0
    assert ranks.get("nope.test", -1) == -1


def test_host_ranks_vectorized_lookup_matches_dict():
    from cex_crawler_ray.pipelines.crawl import HostRanks, _rank_array

    d = {f"h{i}.test": i + 1 for i in range(1000)}
    hr = HostRanks.from_dict(d)
    hosts = [f"h{i}.test" for i in range(0, 2000, 7)]  # half misses
    got = hr.lookup(hosts)
    want = _rank_array(d, hosts)
    assert (got == want).all()


def test_cap_accepts_host_ranks_object():
    from cex_crawler_ray.pipelines.crawl import (
        HostRanks,
        _apply_round_cap,
        _cap_quotas,
    )

    tbl = _sched_tbl(
        [
            ("a1", "a", 1, 0, 10, True),
            ("a2", "a", 2, 0, 11, True),
            ("b1", "b", 3, 0, 1, True),
            ("b2", "b", 4, 0, 2, True),
        ]
    )
    hr = HostRanks.from_dict({"b": 100, "a": 1})
    out = _apply_round_cap(tbl, hr, cap=2)
    kept = [
        u
        for u, s in zip(out["url"].to_pylist(), out["scheduled"].to_pylist())
        if s
    ]
    assert kept == ["b1", "b2"]
    quotas = _cap_quotas(
        tbl.drop_columns(["fetch_slot", "scheduled"]), hr, cap=2
    )
    assert quotas == {"b": 2}


def test_capped_crawl_defers_not_drops(ray_session, tmp_path):
    """A capped crawl fetches <= cap pages per round but converges to
    the SAME fetched set as the uncapped run (capped-out rows defer)."""
    from cex_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from cex_crawler_ray.sources.page_store import PageStore
    from cex_crawler_ray.sources.pages import (
        pages_from_documents,
        robots_rules,
        seeds_for_sources,
        sources_in,
    )
    from cex_crawler_ray.stages.extract import profiles_for_sources
    from cex_crawler_ray.state.politeness import RobotsPolicy

    ps = PageStore(str(tmp_path / "ps"), num_buckets=4)
    ps.write(pages_from_documents(SF_TINY))
    src = sources_in(SF_TINY)
    policy = RobotsPolicy(
        disallow=robots_rules(src), default_delay_ms=500
    )

    def go(cap):
        return run_crawl(
            ps,
            seeds_for_sources(src),
            policy,
            CrawlConfig(
                max_rounds=40,
                profiles=profiles_for_sources(src),
                as_of_hk="2024-03-08 09:00:00",
                offset_days=7,
                round_fetch_cap=cap,
                host_ranks={"src0.test": 10},
            ),
        )

    capped = go(60)
    uncapped = go(None)
    for m in capped.metrics:
        assert m.scheduled <= 60
    cu = set(capped.fetched_table()["url"].to_pylist())
    uu = set(uncapped.fetched_table()["url"].to_pylist())
    assert cu == uu


def test_capped_crawl_distributed_matches_driver(ray_session, tmp_path):
    """The distributed-path cap (per-host slot quotas) must produce the
    IDENTICAL capped crawl as the in-memory path: same per-round
    scheduled counts, same fetched set."""
    from cex_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from cex_crawler_ray.sources.page_store import PageStore
    from cex_crawler_ray.sources.pages import (
        pages_from_documents,
        robots_rules,
        seeds_for_sources,
        sources_in,
    )
    from cex_crawler_ray.stages.extract import profiles_for_sources
    from cex_crawler_ray.state.politeness import RobotsPolicy

    ps = PageStore(str(tmp_path / "ps"), num_buckets=4)
    ps.write(pages_from_documents(SF_TINY))
    src = sources_in(SF_TINY)
    policy = RobotsPolicy(disallow=robots_rules(src), default_delay_ms=500)
    common = dict(
        max_rounds=8,
        profiles=profiles_for_sources(src),
        as_of_hk="2024-03-08 09:00:00",
        offset_days=7,
        round_fetch_cap=40,
        host_ranks={"src1.test": 50, "src2.test": 10},
        seen_shards=4,
    )

    mem = run_crawl(
        ps, seeds_for_sources(src), policy, CrawlConfig(**common)
    )
    dist = run_crawl(
        ps,
        seeds_for_sources(src),
        policy,
        CrawlConfig(driver_schedule_max_rows=0, **common),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    mem_urls = sorted(mem.fetched_table()["url"].to_pylist())
    dist_urls = sorted(dist.fetched_table()["url"].to_pylist())
    assert mem_urls == dist_urls
    for m in dist.metrics:
        assert m.scheduled <= 40
