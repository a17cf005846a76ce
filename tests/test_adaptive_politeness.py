"""AIMD adaptive politeness: per-host delay multipliers from observed
throttle signals (429/503), folded deterministically between rounds."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cex_crawler_ray.state.politeness import AdaptiveDelay, RobotsPolicy


def test_aimd_fold():
    ad = AdaptiveDelay(increase=2.0, decrease=0.25, max_mult=16.0)
    robots = RobotsPolicy(default_delay_ms=500)
    # throttled rounds: multiplicative increase, capped
    for expected in (2.0, 4.0, 8.0, 16.0, 16.0):
        ad.observe("h.test", n_ok=3, n_throttled=1)
        assert ad.mult["h.test"] == expected
    # clean rounds: additive decrease back toward the floor
    ad.observe("h.test", n_ok=5, n_throttled=0)
    assert ad.mult["h.test"] == 15.75
    # tokens use the effective delay
    assert ad.tokens_per_round(robots, "h.test", 10_000) == int(
        10_000 // (500 * 15.75)
    )
    # untouched host = static budget
    assert ad.tokens_per_round(robots, "other.test", 10_000) == 20
    # full decay removes the entry (state bounded by sick hosts only)
    for _ in range(60):
        ad.observe("h.test", n_ok=1, n_throttled=0)
    assert "h.test" not in ad.mult


def test_zero_observation_rounds_do_not_decay():
    ad = AdaptiveDelay()
    ad.observe("h.test", n_ok=0, n_throttled=1)
    m = ad.mult["h.test"]
    ad.observe("h.test", n_ok=0, n_throttled=0)  # host not fetched
    assert ad.mult["h.test"] == m


def test_crawl_loop_folds_throttles(ray_session, sf_tiny, tmp_path):
    """A host that answers 429 gets its budget cut for later rounds;
    healthy hosts keep static budgets; the run is deterministic."""
    from cex_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from cex_crawler_ray.sources.page_store import PageStore
    from cex_crawler_ray.sources.pages import (
        pages_from_documents,
        robots_rules,
        seeds_for_sources,
        sources_in,
    )
    from cex_crawler_ray.stages.extract import profiles_for_sources

    store = PageStore(str(tmp_path / "store"), num_buckets=8)
    store.write(pages_from_documents(sf_tiny))
    sources = sources_in(sf_tiny)
    robots = RobotsPolicy(
        disallow=robots_rules(sources), default_delay_ms=500
    )
    sick = "src1.test"

    def throttled_fetch(tbl: pa.Table):
        ds = store.fetch_aligned(tbl)

        def throttle(batch: pa.Table) -> pa.Table:
            is_sick = pc.equal(batch["host"], sick)
            status = pc.if_else(
                is_sick, pa.scalar(429, pa.int32()), batch["status"]
            )
            html = pc.if_else(
                is_sick, pa.scalar(None, batch["html"].type), batch["html"]
            )
            i = batch.column_names.index("status")
            out = batch.set_column(i, "status", status)
            return out.set_column(
                batch.column_names.index("html"), "html", html
            )

        return ds.map_batches(throttle, batch_format="pyarrow")

    ad = AdaptiveDelay()
    cfg = CrawlConfig(
        max_rounds=4,
        seen_shards=2,
        profiles=profiles_for_sources(sources),
        as_of_hk="2024-03-08 09:00:00",
        offset_days=7,
        fetch_fn=throttled_fetch,
        adaptive=ad,
    )
    run = run_crawl(store, seeds_for_sources(sources), robots, cfg)
    assert run.rounds_done >= 2
    # the sick host throttled at least once -> multiplier grew
    assert ad.mult.get(sick, 1.0) >= 2.0
    # healthy hosts never enter the multiplier table
    assert all(h == sick for h in ad.mult)
    # budget math: the sick host's next-round tokens are cut vs static
    static = robots.tokens_per_round(sick, cfg.round_ms)
    assert ad.tokens_per_round(robots, sick, cfg.round_ms) < static


def test_adaptive_state_survives_resume(ray_session, sf_tiny, tmp_path):
    """Multipliers checkpoint with the manifest: a resumed crawl keeps
    the sick host slowed instead of resetting to the static budget."""
    from cex_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from cex_crawler_ray.sources.page_store import PageStore
    from cex_crawler_ray.sources.pages import (
        pages_from_documents,
        robots_rules,
        seeds_for_sources,
        sources_in,
    )
    from cex_crawler_ray.stages.extract import profiles_for_sources

    store = PageStore(str(tmp_path / "store"), num_buckets=8)
    store.write(pages_from_documents(sf_tiny))
    sources = sources_in(sf_tiny)
    robots = RobotsPolicy(
        disallow=robots_rules(sources), default_delay_ms=500
    )
    sick = "src1.test"

    def throttled_fetch(tbl: pa.Table):
        ds = store.fetch_aligned(tbl)

        def throttle(batch: pa.Table) -> pa.Table:
            is_sick = pc.equal(batch["host"], sick)
            status = pc.if_else(
                is_sick, pa.scalar(429, pa.int32()), batch["status"]
            )
            return batch.set_column(
                batch.column_names.index("status"), "status", status
            )

        return ds.map_batches(throttle, batch_format="pyarrow")

    ckpt = str(tmp_path / "ckpt")
    kwargs = dict(
        seen_shards=2,
        profiles=profiles_for_sources(sources),
        as_of_hk="2024-03-08 09:00:00",
        offset_days=7,
        fetch_fn=throttled_fetch,
    )
    ad1 = AdaptiveDelay()
    run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        CrawlConfig(max_rounds=2, adaptive=ad1, **kwargs),
        checkpoint_dir=ckpt,
    )
    assert ad1.mult.get(sick, 1.0) >= 2.0

    # fresh AdaptiveDelay object, resumed checkpoint -> state restored
    ad2 = AdaptiveDelay()
    run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        CrawlConfig(max_rounds=1, adaptive=ad2, **kwargs),
        checkpoint_dir=ckpt,
    )
    assert ad2.mult.get(sick, 1.0) >= ad1.mult.get(sick, 1.0) - 0.25
