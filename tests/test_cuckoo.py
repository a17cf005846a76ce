"""Cuckoo-filter seen mode: no false negatives, bounded fpp, DELETE
support (the capability Bloom lacks — forced recrawl without rebuild),
kick-loop behavior near capacity, crawl parity with exact mode, and
snapshot/restore."""

import numpy as np
import pytest


def _keys(n, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_cuckoo_no_false_negatives_and_bounded_fpp():
    from cex_crawler_ray.state.seen_filter import _Cuckoo

    c = _Cuckoo(1 << 15)  # 32k buckets * 4 slots = 131k capacity
    keys = _keys(60_000)  # ~0.46 load
    assert not c.contains(keys).any()
    assert c.add(keys).all()
    assert c.contains(keys).all()  # cuckoo filters have NO false negatives

    fresh = _keys(60_000, seed=2)
    fresh = fresh[~np.isin(fresh, keys)]
    fpp = c.contains(fresh).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: fpp ~ 8/65535 ~ 0.012%
    assert fpp < 0.005


def test_cuckoo_kick_loop_near_capacity():
    from cex_crawler_ray.state.seen_filter import _Cuckoo

    c = _Cuckoo(1 << 8)  # 256 buckets * 4 = 1024 slots
    keys = _keys(870, seed=3)  # ~0.85 load: bulk passes overflow, kicks run
    assert c.add(keys).all()
    assert c.contains(keys).all()


def test_cuckoo_delete_then_readmit():
    from cex_crawler_ray.state.seen_filter import _Cuckoo

    c = _Cuckoo(1 << 12)
    keys = _keys(5_000, seed=4)
    c.add(keys)
    victim = keys[:100]
    removed = c.delete(victim)
    assert removed.all()
    # deleting again finds nothing (fingerprints are gone)
    assert not c.delete(victim).any()
    # re-inserting works
    assert c.add(victim).all()
    assert c.contains(victim).all()


def test_seen_pool_cuckoo_admit_delete_readmit(ray_session):
    from cex_crawler_ray.state.seen_filter import SeenFilterPool

    pool = SeenFilterPool(num_shards=4, mode="cuckoo", cuckoo_buckets=1 << 10)
    keys = _keys(2_000, seed=5)
    first = pool.check_and_add(keys)
    assert first.all()
    second = pool.check_and_add(keys)
    assert not second.any()
    assert pool.total() == len(keys)

    # forced recrawl: delete a slice, it admits again exactly once
    slice_ = keys[:50]
    assert pool.delete(slice_).all()
    readmit = pool.check_and_add(slice_)
    assert readmit.all()


def test_seen_pool_bloom_delete_raises(ray_session):
    import ray

    from cex_crawler_ray.state.seen_filter import SeenFilterPool

    pool = SeenFilterPool(num_shards=2, mode="bloom")
    pool.check_and_add(_keys(10))
    with pytest.raises(Exception):
        pool.delete(_keys(10))


def test_seen_pool_exact_delete(ray_session):
    from cex_crawler_ray.state.seen_filter import SeenFilterPool

    pool = SeenFilterPool(num_shards=2, mode="exact")
    keys = _keys(500, seed=6)
    pool.check_and_add(keys)
    assert pool.delete(keys[:20]).all()
    assert pool.check_and_add(keys[:20]).all()
    assert not pool.check_and_add(keys[20:40]).any()


def test_cuckoo_snapshot_restore(ray_session):
    from cex_crawler_ray.state.seen_filter import SeenFilterPool

    pool = SeenFilterPool(num_shards=2, mode="cuckoo", cuckoo_buckets=1 << 10)
    keys = _keys(1_000, seed=7)
    pool.check_and_add(keys)
    snaps = pool.snapshot()

    pool2 = SeenFilterPool(num_shards=2, mode="cuckoo", cuckoo_buckets=1 << 10)
    pool2.restore(snaps)
    assert not pool2.check_and_add(keys).any()  # all still seen
    assert pool2.total() == pool.total()
    assert pool2.check_and_add(_keys(100, seed=8)).all()


def test_cuckoo_crawl_matches_exact(ray_session, sf_tiny):
    from cex_crawler_ray.pipelines.flagship import run_flagship_crawl

    exact = run_flagship_crawl(sf_tiny)
    cuckoo = run_flagship_crawl(sf_tiny, seen_mode="cuckoo")
    assert sorted(cuckoo.fetched_table()["url"].to_pylist()) == sorted(
        exact.fetched_table()["url"].to_pylist()
    )
    assert cuckoo.crawl_order() == exact.crawl_order()


def test_cuckoo_delete_compacts_rows_no_overwrite():
    """Regression: delete leaves mid-row holes; a later bulk insert
    writes at occupancy+rank and would overwrite live fingerprints if
    rows weren't re-compacted."""
    from cex_crawler_ray.state.seen_filter import _Cuckoo

    c = _Cuckoo(1 << 10)
    keys = _keys(3_000, seed=9)
    c.add(keys)
    del_set = keys[::3]
    keep_set = np.setdiff1d(keys, del_set)
    assert c.delete(del_set).all()
    # heavy re-insert pressure on the holed rows
    c.add(_keys(1_500, seed=10))
    assert c.contains(keep_set).all()  # no survivor lost its fingerprint


def test_cuckoo_overflow_keys_reported_not_new():
    """Kick-loop overflow must demote the key to not-new in the shard:
    an unrecorded key reported new would be re-admitted on a later
    batch, and shard count would drift from filter contents."""
    from cex_crawler_ray.state.seen_filter import SeenShard

    # plain-class instantiation of the actor body (no cluster needed)
    cls = SeenShard.__ray_metadata__.modified_class
    shard = cls(mode="cuckoo", cuckoo_buckets=1 << 4)  # 64 slots
    keys = _keys(400, seed=11)  # way past capacity -> overflow certain
    new = shard.check_and_add(keys)
    admitted = int(new.sum())
    assert admitted < len(keys)  # some inserts failed
    # count matches what the filter actually holds
    assert shard.count == admitted == int(shard.cuckoo.count)
    # an overflowed key (reported not-new) is genuinely absent, so a
    # retry may admit it once capacity frees up — never silently lost
    failed = keys[~new]
    assert not shard.cuckoo.contains(failed).all()
