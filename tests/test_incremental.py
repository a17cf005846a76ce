"""Incremental re-crawl (the reference's cron-tick semantics,
``run.sh:5-6``): a second run against a GROWN web re-fetches the hub
pages, discovers everything, but fetches only the new articles — the
seen-filter checkpoint is the cross-run dedup, exactly like the
reference's ``os.path.exists`` skip (``exchange/binance.py:253-255``)."""

import pyarrow.compute as pc
import pytest

import ray

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


def test_incremental_recrawl_fetches_only_new(
    ray_session, sf_tiny, tmp_path
):
    sources = sources_in(sf_tiny)
    robots = RobotsPolicy(
        disallow=robots_rules(sources), default_delay_ms=200
    )

    def cfg():
        return CrawlConfig(
            max_rounds=30,
            seen_shards=4,
            profiles=profiles_for_sources(sources),
            as_of_hk="2024-03-08 09:00:00",
            offset_days=7,
        )

    # tick 1: the web has only articles with doc_id < 300
    store_v1 = PageStore(str(tmp_path / "web_v1"), num_buckets=8)
    store_v1.write(pages_from_documents(sf_tiny, max_doc_id=300))
    ckpt = str(tmp_path / "ckpt")
    run1 = run_crawl(
        store_v1, seeds_for_sources(sources), robots, cfg(),
        checkpoint_dir=ckpt,
    )
    urls1 = set(run1.fetched_table()["url"].to_pylist())
    art1 = {u for u in urls1 if "/articles/" in u}
    assert all(int(u.rsplit("/", 1)[-1]) < 300 for u in art1)

    # tick 2: the site grew (all 500 articles); same checkpoint
    store_v2 = PageStore(str(tmp_path / "web_v2"), num_buckets=8)
    store_v2.write(pages_from_documents(sf_tiny))
    run2 = run_crawl(
        store_v2, seeds_for_sources(sources), robots, cfg(),
        checkpoint_dir=ckpt, reseed=True,
    )
    fetched2 = run2.fetched_table()
    new_rounds = fetched2.filter(
        pc.greater_equal(fetched2["fetch_round"], run1.rounds_done)
    )
    new_urls = set(new_rounds["url"].to_pylist())
    new_articles = {u for u in new_urls if "/articles/" in u}

    # hubs were re-fetched (list pages always re-read), old articles NOT
    assert any(u.endswith("/hub") for u in new_urls)
    assert not (new_articles & art1), "re-fetched an already-seen article"
    # every newly published (robots-allowed) article was fetched
    ids = {int(u.rsplit("/", 1)[-1]) for u in new_articles}
    assert ids and min(ids) >= 300
    from cex_crawler_ray.sources.pages import article_url, src_num

    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
    )
    expected_new = {
        article_url(s, d)
        for d, s in zip(
            docs["doc_id"].to_pylist(), docs["source"].to_pylist()
        )
        if d >= 300
        and not (src_num(s) % 5 == 4 and str(d).startswith("1"))
    }
    assert new_articles == expected_new
