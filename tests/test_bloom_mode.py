"""Bloom-only seen-filter mode (the 10^10-scale configuration): same
crawl result as exact mode at sandbox scale (FP probability ~0 at 4M
bits / 520 keys), bounded memory by construction."""

import numpy as np
import pytest


def test_bloom_crawl_matches_exact(ray_session, sf_tiny):
    from cex_crawler_ray.pipelines.flagship import run_flagship_crawl

    exact = run_flagship_crawl(sf_tiny)
    bloom = run_flagship_crawl(sf_tiny, seen_mode="bloom")
    assert sorted(bloom.fetched_table()["url"].to_pylist()) == sorted(
        exact.fetched_table()["url"].to_pylist()
    )
    assert bloom.crawl_order() == exact.crawl_order()


def test_bloom_filter_properties(ray_session):
    from cex_crawler_ray.state.seen_filter import _Bloom

    b = _Bloom(1 << 16)
    keys = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    assert not b.contains(keys).any()
    b.add(keys[:500])
    assert b.contains(keys[:500]).all()  # no false negatives, ever
    fp = b.contains(keys[500:]).mean()
    assert fp < 0.05  # 64k bits / 500 keys -> tiny FP rate


def test_bloom_shard_idempotent_admission(ray_session):
    from cex_crawler_ray.state.seen_filter import SeenFilterPool

    pool = SeenFilterPool(num_shards=2, mode="bloom", bloom_bits=1 << 18)
    keys = np.arange(200, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    first = pool.check_and_add(keys)
    assert first.all()
    again = pool.check_and_add(keys)
    assert not again.any()  # re-admission impossible (task-retry safety)
