"""Golden-file guards (FIXTURES.md §5): crawl order and fetched url set
under the fixed seed list + politeness budget must never drift across
engine versions (north_rule: matching crawl ordering + URL-seen set)."""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def flagship_run(ray_session, sf_tiny):
    from cex_crawler_ray.pipelines.flagship import run_flagship_crawl

    return run_flagship_crawl(sf_tiny)


def test_crawl_order_matches_golden(flagship_run):
    golden = open(
        os.path.join(GOLDEN, "crawl_order_sf0.001.txt"), encoding="utf-8"
    ).read().splitlines()
    assert flagship_run.crawl_order() == golden


def test_fetched_set_matches_golden(flagship_run):
    golden = open(
        os.path.join(GOLDEN, "fetched_set_sf0.001.txt"), encoding="utf-8"
    ).read().splitlines()
    assert sorted(flagship_run.fetched_table()["url"].to_pylist()) == golden


def test_lineage_recorded_per_round(flagship_run):
    assert len(flagship_run.lineage) == flagship_run.rounds_done
    for entry in flagship_run.lineage:
        assert set(entry) == {"round", "fetched", "frontier_next"}
        assert len(entry["fetched"]) == 16


def test_flagship_politeness_budgets_respected(flagship_run, sf_tiny):
    """No (host, round) exceeds its per-host token budget
    (20/10/6 by source index % 3)."""
    import collections

    from cex_crawler_ray.pipelines.flagship import (
        DEFAULT_DELAY_MS,
        crawl_delays_for,
    )
    from cex_crawler_ray.sources.pages import sources_in

    delays = crawl_delays_for(sources_in(sf_tiny))
    fetched = flagship_run.fetched_table()
    counts = collections.Counter(
        zip(fetched["host"].to_pylist(), fetched["fetch_round"].to_pylist())
    )
    for (host, _round), n in counts.items():
        budget = max(1, 10_000 // delays.get(host, DEFAULT_DELAY_MS))
        assert n <= budget, (host, _round, n, budget)


def test_lineage_stable_across_runs(ray_session, sf_tiny, flagship_run):
    from cex_crawler_ray.pipelines.flagship import run_flagship_crawl

    again = run_flagship_crawl(sf_tiny)
    assert again.lineage == flagship_run.lineage
