"""Misra-Gries heavy hitters: sketch guarantees + two-pass exactness."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _stream(values, parts=5):
    return ray.data.from_arrow(
        pa.table({"k": pa.array(np.asarray(values, dtype=np.int64))})
    ).repartition(parts)


def _zipfish(n=20_000, seed=7):
    rng = np.random.RandomState(seed)
    # keys 0..99; key i with weight ~ 1/(i+1)
    w = 1.0 / np.arange(1, 101)
    return rng.choice(100, size=n, p=w / w.sum())


def test_mg_underestimates_within_bound(ray_session):
    from cex_crawler_ray.stages.sketch import mg_heavy_hitters

    vals = _zipfish()
    tbl, delta, n_total = mg_heavy_hitters(_stream(vals), "k", k=8)
    assert n_total == len(vals)
    assert delta <= len(vals) // 9 + 1
    true = {k: c for k, c in zip(*np.unique(vals, return_counts=True))}
    for key, est in zip(tbl["key"].to_pylist(), tbl["est_count"].to_pylist()):
        assert est <= true[key]
        assert est >= true[key] - delta


def test_mg_guarantees_heavy_keys_present(ray_session):
    from cex_crawler_ray.stages.sketch import mg_heavy_hitters

    vals = _zipfish()
    tbl, delta, n_total = mg_heavy_hitters(_stream(vals), "k", k=8)
    got = set(tbl["key"].to_pylist())
    true_k, true_c = np.unique(vals, return_counts=True)
    for k_, c_ in zip(true_k, true_c):
        if c_ > delta:
            assert int(k_) in got, (k_, c_, delta)


def test_mg_partitioning_invariant_final_answer(ray_session):
    """The exact two-pass output must not depend on batch boundaries."""
    from cex_crawler_ray.stages.sketch import (
        exact_key_counts,
        mg_heavy_hitters,
    )

    vals = _zipfish()
    K = 8
    outs = []
    for parts in (1, 3, 11):
        tbl, _, n_total = mg_heavy_hitters(_stream(vals, parts), "k", k=K)
        cand = set(tbl["key"].to_pylist())
        cnts = exact_key_counts(_stream(vals, parts), "k")
        heavy = sorted(
            (k_, n_)
            for k_, n_ in zip(
                cnts["key"].to_pylist(), cnts["n"].to_pylist()
            )
            if k_ in cand and n_ * (K + 1) > n_total
        )
        outs.append(heavy)
    assert outs[0] == outs[1] == outs[2]
    # and it equals the brute-force phi-heavy set
    true_k, true_c = np.unique(vals, return_counts=True)
    want = sorted(
        (int(k_), int(c_))
        for k_, c_ in zip(true_k, true_c)
        if c_ * (K + 1) > len(vals)
    )
    assert outs[0] == want


def test_mg_driver_merge_equals_groupby_path(ray_session):
    """The driver-side partial merge (block count below threshold) and
    the groupby shuffle fallback (threshold forced to 0) must return
    identical summaries — same keys, counts, delta, and total."""
    from cex_crawler_ray.stages.sketch import mg_heavy_hitters

    vals = _zipfish()
    fast = mg_heavy_hitters(_stream(vals, 7), "k", k=8)
    slow = mg_heavy_hitters(
        _stream(vals, 7), "k", k=8, driver_merge_max_blocks=0
    )
    assert fast[0].equals(slow[0])
    assert fast[1] == slow[1] and fast[2] == slow[2]


def test_exact_key_counts(ray_session):
    from cex_crawler_ray.stages.sketch import exact_key_counts

    vals = [1, 1, 2, 3, 3, 3]
    t = exact_key_counts(_stream(vals, 2), "k")
    assert dict(zip(t["key"].to_pylist(), t["n"].to_pylist())) == {
        1: 2,
        2: 1,
        3: 3,
    }
