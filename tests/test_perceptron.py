"""Distributed integer perceptron: brute-force reference equality,
partition invariance, and separability on the planted-marker corpus.
Catalog oracle parity runs in the whole-catalog sweep."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _bkt(tok, n):
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n


def _brute_train(texts, ys, n_buckets, iters):
    X = np.zeros((len(texts), n_buckets), dtype=np.int64)
    for i, t in enumerate(texts):
        for tok in t.split():
            X[i, _bkt(tok, n_buckets)] += 1
    ys = np.asarray(ys, dtype=np.int64)
    w = np.zeros(n_buckets, dtype=np.int64)
    b = 0
    for _ in range(iters):
        act = X @ w + b
        mis = (ys * act) <= 0
        w = w + (ys[mis, None] * X[mis]).sum(axis=0)
        b = b + int(ys[mis].sum())
    return w, b


def _corpus():
    rng = np.random.RandomState(3)
    vocab = [f"tok{i}" for i in range(40)]
    texts, ys = [], []
    for i in range(120):
        words = [vocab[j] for j in rng.randint(0, 40, 12)]
        if i % 3 == 0:
            words += ["goodmark", "goodmark"]
            ys.append(1)
        else:
            ys.append(-1)
        texts.append(" ".join(words))
    return texts, ys


@pytest.mark.parametrize("iters", [1, 3])
def test_perceptron_matches_reference(ray_session, iters):
    import ray

    from cex_crawler_ray.stages.classifier import perceptron_train

    texts, ys = _corpus()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(texts, pa.string()),
                "y": pa.array(ys, pa.int64()),
            }
        )
    )
    got = perceptron_train(ds, n_buckets=32, iters=iters)
    w_ref, b_ref = _brute_train(texts, ys, 32, iters)
    got_map = dict(zip(got["bkt"], got["w"]))
    assert got_map[-1] == b_ref
    for k in range(32):
        assert got_map[k] == w_ref[k], k


def test_perceptron_partition_invariant(ray_session):
    import ray

    from cex_crawler_ray.stages.classifier import perceptron_train

    texts, ys = _corpus()
    tbl = pa.table(
        {
            "text": pa.array(texts, pa.string()),
            "y": pa.array(ys, pa.int64()),
        }
    )
    a = perceptron_train(
        ray.data.from_arrow(tbl), n_buckets=32, iters=3
    )
    b = perceptron_train(
        ray.data.from_arrow(tbl).repartition(13), n_buckets=32, iters=3
    )
    pd.testing.assert_frame_equal(a, b)


def test_perceptron_learns_marker(ray_session):
    import ray

    from cex_crawler_ray.stages.classifier import (
        perceptron_scores,
        perceptron_train,
    )

    texts, ys = _corpus()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "y": pa.array(ys, pa.int64()),
            }
        )
    )
    w = perceptron_train(ds, n_buckets=32, iters=5)
    # the planted marker's bucket should carry positive weight
    mk = _bkt("goodmark", 32)
    assert dict(zip(w["bkt"], w["w"]))[mk] > 0
    scored = perceptron_scores(ds, w, n_buckets=32).to_pandas()
    acc = (
        scored.sort_values("doc_id")["pred"].to_numpy()
        == np.asarray(ys)
    ).mean()
    assert acc > 0.9
