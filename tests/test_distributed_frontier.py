"""The distributed frontier path (robots gate + politeness schedule in
workers, frontier as worker-written Parquet, driver holds only paths +
counts) must produce the IDENTICAL crawl to the driver-side path.

Forced via ``driver_schedule_max_rows=0`` so every round — however small
— runs the distributed pipeline (gate + local per-host precut ->
candidate shuffle -> exact per-host schedule).
"""

import json
import os

import pytest

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


@pytest.fixture(scope="module")
def store(ray_session, sf_tiny, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pagestore_dist"))
    ps = PageStore(path, num_buckets=8)
    ps.write(pages_from_documents(sf_tiny))
    return ps


@pytest.fixture(scope="module")
def crawl_inputs(sf_tiny):
    sources = sources_in(sf_tiny)
    robots = RobotsPolicy(
        disallow=robots_rules(sources), default_delay_ms=500
    )
    kwargs = dict(
        max_rounds=6,
        seen_shards=4,
        profiles=profiles_for_sources(sources),
        as_of_hk="2024-03-08 09:00:00",
        offset_days=7,
    )
    return sources, robots, kwargs


def test_distributed_matches_driver_path(store, crawl_inputs, tmp_path):
    sources, robots, kwargs = crawl_inputs
    seeds = seeds_for_sources(sources)

    mem = run_crawl(store, seeds, robots, CrawlConfig(**kwargs))

    ckpt = str(tmp_path / "dist_ckpt")
    dist = run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        CrawlConfig(driver_schedule_max_rows=0, **kwargs),
        checkpoint_dir=ckpt,
    )

    # identical crawl order, fetched set, and seen set
    assert dist.crawl_order() == mem.crawl_order()
    assert sorted(dist.fetched_table()["url"].to_pylist()) == sorted(
        mem.fetched_table()["url"].to_pylist()
    )
    assert dist.seen_set_size() == mem.seen_set_size()

    # identical per-round metrics (the schedule/defer/robots split is a
    # pure function of the frontier, not of where it executes)
    for a, b in zip(dist.metrics, mem.metrics):
        assert (a.round_no, a.frontier_in, a.robots_blocked) == (
            b.round_no,
            b.frontier_in,
            b.robots_blocked,
        )
        assert (a.scheduled, a.deferred, a.discovered_new) == (
            b.scheduled,
            b.deferred,
            b.discovered_new,
        )

    # no driver-materialized frontier file: every round checkpoints
    # worker-written dirs, never a driver-written frontier_next.parquet
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert manifest["frontier"] is not None
    for j in range(dist.rounds_done):
        assert not os.path.exists(
            os.path.join(ckpt, f"round={j}", "frontier_next.parquet")
        )


def test_distributed_resume_no_refetch(store, crawl_inputs, tmp_path):
    sources, robots, kwargs = crawl_inputs
    cfg = CrawlConfig(driver_schedule_max_rows=0, **kwargs)
    full = run_crawl(
        store, seeds_for_sources(sources), robots, CrawlConfig(**kwargs)
    )

    ckpt = str(tmp_path / "dist_resume")
    part = run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        cfg,
        checkpoint_dir=ckpt,
        stop_after_round=1,
    )
    fetched_before = part.fetched_table().num_rows
    resumed = run_crawl(
        store, seeds_for_sources(sources), robots, cfg, checkpoint_dir=ckpt
    )
    assert sorted(resumed.fetched_table()["url"].to_pylist()) == sorted(
        full.fetched_table()["url"].to_pylist()
    )
    assert resumed.crawl_order() == full.crawl_order()
    import pyarrow.compute as pc

    ft = resumed.fetched_table()
    refetched = ft.filter(
        pc.greater_equal(ft["fetch_round"], part.rounds_done)
    ).num_rows
    assert refetched == ft.num_rows - fetched_before


def test_distributed_reseed_tick(store, crawl_inputs, tmp_path):
    """Incremental cron tick through the distributed path: hub pages are
    re-fetched, already-seen articles are not."""
    sources, robots, kwargs = crawl_inputs
    cfg = CrawlConfig(driver_schedule_max_rows=0, **kwargs)
    ckpt = str(tmp_path / "dist_reseed")

    first = run_crawl(
        store, seeds_for_sources(sources), robots, cfg, checkpoint_dir=ckpt
    )
    n_first = first.fetched_table().num_rows

    second = run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        cfg,
        checkpoint_dir=ckpt,
        reseed=True,
    )
    ft = second.fetched_table()
    # the tick re-fetched exactly the hub pages (seeds), nothing else
    import pyarrow.compute as pc

    new_rows = ft.filter(
        pc.greater_equal(ft["fetch_round"], first.rounds_done)
    )
    n_seeds = seeds_for_sources(sources).count()
    assert new_rows.num_rows == n_seeds
    assert all(
        "/announcements" in u or u.rstrip("/").endswith("news")
        or "/articles/" not in u
        for u in new_rows["url"].to_pylist()
    )
    assert ft.num_rows == n_first + n_seeds


def test_compact_checkpoint_preserves_resume(store, crawl_inputs, tmp_path):
    """GC of consumed frontier state mid-crawl: only the manifest's
    live paths survive, and a resumed run is still identical."""
    from cex_crawler_ray.pipelines.crawl import compact_checkpoint

    sources, robots, kwargs = crawl_inputs
    # auto_compact off: this test exercises the MANUAL compaction CLI
    cfg = CrawlConfig(
        driver_schedule_max_rows=0, auto_compact=False, **kwargs
    )
    full = run_crawl(
        store, seeds_for_sources(sources), robots, CrawlConfig(**kwargs)
    )

    ckpt = str(tmp_path / "gc_ckpt")
    run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        cfg,
        checkpoint_dir=ckpt,
        stop_after_round=2,
    )
    report = compact_checkpoint(ckpt)
    # something was collected (round-0 deferred state is consumed) and
    # the live frontier paths survived
    assert report["removed"]
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    for p in manifest["frontier"]:
        assert os.path.exists(os.path.join(ckpt, p)), p

    resumed = run_crawl(
        store, seeds_for_sources(sources), robots, cfg, checkpoint_dir=ckpt
    )
    assert resumed.crawl_order() == full.crawl_order()
    assert sorted(resumed.fetched_table()["url"].to_pylist()) == sorted(
        full.fetched_table()["url"].to_pylist()
    )


def test_auto_compact_keeps_one_frontier_generation(
    store, crawl_inputs, tmp_path
):
    """With auto_compact (the default) a multi-round crawl's checkpoint
    holds exactly ONE frontier generation — only the manifest-named
    paths — and still crash-resumes identically."""
    from cex_crawler_ray.pipelines.crawl import compact_checkpoint

    sources, robots, kwargs = crawl_inputs
    cfg = CrawlConfig(driver_schedule_max_rows=0, **kwargs)
    full = run_crawl(
        store, seeds_for_sources(sources), robots, CrawlConfig(**kwargs)
    )

    ckpt = str(tmp_path / "auto_gc_ckpt")
    part = run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        cfg,
        checkpoint_dir=ckpt,
        stop_after_round=2,
    )
    assert part.rounds_done >= 2
    # nothing left for a manual compaction: every consumed generation
    # was GC'd after its round's manifest commit
    report = compact_checkpoint(ckpt)
    assert report["removed"] == []
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    live = {os.path.normpath(p) for p in manifest["frontier"]}
    # the only frontier-state paths on disk are the live ones
    for j in range(part.rounds_done):
        for sub in ("deferred", "frontier_next.parquet"):
            p = os.path.join(ckpt, f"round={j}", sub)
            if os.path.exists(p):
                assert os.path.normpath(
                    os.path.relpath(p, ckpt)
                ) in live, p
    for name in os.listdir(ckpt):
        if name.startswith(("seeds-", "reseed_clean-")):
            assert os.path.normpath(name) in live, name

    resumed = run_crawl(
        store, seeds_for_sources(sources), robots, cfg, checkpoint_dir=ckpt
    )
    assert resumed.crawl_order() == full.crawl_order()


def test_distributed_schedule_under_host_skew(ray_session, tmp_path):
    """A 90%-one-host frontier (binance-style skew): the distributed
    schedule still selects the exact per-host top-tokens, and the hot
    host's candidate volume is bounded by blocks x tokens, not its
    frontier size."""
    import numpy as np
    import pyarrow as pa

    import ray as _ray

    from cex_crawler_ray.pipelines.crawl import (
        CAND_SCHEMA,
        SCHED_SCHEMA,
        _gate_precut_fn,
        _sched_exact_fn,
        _schedule_driver,
        _to_table,
    )
    from cex_crawler_ray.state.politeness import RobotsPolicy

    n_hot, n_cold = 9000, 1000
    rng = np.random.RandomState(11)
    hosts = ["hot.test"] * n_hot + [
        f"cold{i % 20}.test" for i in range(n_cold)
    ]
    urls = [f"https://{h}/p{i}" for i, h in enumerate(hosts)]
    tbl = pa.table(
        {
            "url": pa.array(urls),
            "host": pa.array(hosts),
            "url_hash": pa.array(
                rng.randint(0, 2**63, size=len(urls), dtype=np.int64
                            ).astype(np.uint64),
                pa.uint64(),
            ),
            "title": pa.array([""] * len(urls)),
            "priority": pa.array(np.zeros(len(urls), np.int32), pa.int32()),
            "depth": pa.array(np.zeros(len(urls), np.int32), pa.int32()),
            "discovered_ts": pa.array(np.zeros(len(urls), np.int64), pa.int64()),
        }
    )
    budgets = {"hot.test": 10}
    robots = RobotsPolicy()
    policy_ref = _ray.put((robots, budgets, 5))
    deferred_dir = str(tmp_path / "defer")
    import os as _os

    _os.makedirs(deferred_dir, exist_ok=True)
    ds = _ray.data.from_arrow(tbl).repartition(16)
    sched = _to_table(
        ds.map_batches(
            _gate_precut_fn(policy_ref, deferred_dir),
            batch_format="pyarrow",
        )
        .groupby("host_part")
        .map_groups(
            _sched_exact_fn(policy_ref, deferred_dir),
            batch_format="pyarrow",
        ),
        SCHED_SCHEMA,
    )
    # exact equality with the driver-side schedule's selected set
    drv = _schedule_driver(tbl, budgets, 5)
    drv_sel = drv.filter(drv["scheduled"])
    got = sorted(
        zip(sched["host"].to_pylist(), sched["url_hash"].to_pylist())
    )
    want = sorted(
        zip(drv_sel["host"].to_pylist(), drv_sel["url_hash"].to_pylist())
    )
    assert got == want
    # the hot host scheduled exactly its budget
    hot = [h for h, _ in got if h == "hot.test"]
    assert len(hot) == 10


def test_deferred_write_idempotent(tmp_path):
    """Ray task re-execution writes the SAME deferred file (content-
    derived name), so duplicated execution cannot duplicate rows."""
    import os

    import numpy as np
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import _write_deferred

    t = pa.table(
        {
            "url": pa.array(["https://h.test/a", "https://h.test/b"]),
            "url_hash": pa.array(
                np.array([7, 9], dtype=np.uint64), pa.uint64()
            ),
        }
    )
    d = str(tmp_path / "defer")
    os.makedirs(d)
    _write_deferred(t, d, "pre")
    _write_deferred(t, d, "pre")  # simulated task re-execution
    files = os.listdir(d)
    assert len(files) == 1
    import pyarrow.parquet as pq

    assert pq.read_table(os.path.join(d, files[0])).num_rows == 2
