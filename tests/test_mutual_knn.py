"""Mutual (reciprocal) kNN pairs: numpy brute-force reference +
partition invariance + symmetric-duplicate sanity."""

import numpy as np
import pandas as pd

import ray


def _brute_mutual(vecs, ids, k):
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = m @ m.T
    topk = {}
    for i in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[i, j], ids[j]),
        )[:k]
        topk[ids[i]] = {ids[j] for j in order}
    pairs = set()
    for a in ids:
        for b in topk[a]:
            if a < b and a in topk[b]:
                pairs.add((a, b))
    return sorted(pairs)


def test_mutual_knn_matches_brute_force(ray_session):
    from cex_crawler_ray.stages.similarity import mutual_knn_pairs

    rng = np.random.default_rng(12)
    n, d, k = 120, 8, 4
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    # plant exact duplicates: must be mutual rank-1 of each other
    vecs[7] = vecs[3]
    vecs[55] = vecs[20]
    ids = np.arange(n, dtype=np.int64)
    expected = _brute_mutual(vecs.astype(np.float64), ids, k)

    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    for parts in (1, 4):
        out = mutual_knn_pairs(
            ray.data.from_pandas(df).repartition(parts), k=k
        )
        got = list(zip(out["id_a"].tolist(), out["id_b"].tolist()))
        assert got == expected

    assert (3, 7) in expected and (20, 55) in expected


def test_gram_matrix_partition_invariance(ray_session):
    """Fixed-point per-term rounding makes the Gram sums order-free:
    different block boundaries must give bit-identical results."""
    import __ray_entry__ as m

    sf = "/root/testdata/sf0.001"
    a = m.q_gram_matrix(sf)
    # numpy reference: round-then-sum per term, float32->float64 exact
    import pyarrow.parquet as pq

    x = np.stack(
        pq.read_table(f"{sf}/embeddings.parquet")
        .column("embedding")
        .to_pylist()
    ).astype(np.float64)
    t = x[:, :, None] * x[:, None, :] * 1e9
    t = np.sign(t) * np.floor(np.abs(t) + 0.5)
    g = t.sum(axis=0).astype(np.int64)
    iu = np.triu_indices(64)
    assert (a["g_e9"].to_numpy() == g[iu]).all()
    # symmetric corner: diagonal terms are squared norms * 1e9 >= 0
    diag = a[a["i"] == a["j"]]["g_e9"].to_numpy()
    assert (diag >= 0).all()


def test_pca_power_iteration_matches_eigh(ray_session):
    """Power iteration over the distributed Gram matrix converges to
    numpy's dominant eigenpair (PCA end-to-end: one corpus pass + a
    d x d driver finish)."""
    import __ray_entry__ as m

    gram = m.q_gram_matrix("/root/testdata/sf0.001")
    lam, v = m.pca_top_eigvec(gram)

    g = np.zeros((64, 64))
    iu = np.triu_indices(64)
    g[iu] = gram["g_e9"].to_numpy(np.int64) / 1e9
    g = g + g.T - np.diag(np.diag(g))
    w, vecs = np.linalg.eigh(g)
    ref_lam, ref_v = w[-1], vecs[:, -1]
    if ref_v[np.argmax(np.abs(ref_v))] < 0:
        ref_v = -ref_v
    assert abs(lam - ref_lam) / abs(ref_lam) < 1e-9
    assert np.abs(v - ref_v).max() < 1e-6


def test_mutual_knn_ann_precision_and_planted_recall(ray_session):
    """ANN path: (a) structurally a subset of the exact mutual set
    (verify_exact re-checks candidate-pair nodes with exact top-k);
    (b) planted near-identical pairs — each the other's #1 neighbor —
    are always found (same IVF list)."""
    from cex_crawler_ray.stages.similarity import (
        mutual_knn_pairs,
        mutual_knn_pairs_ann,
    )

    rng = np.random.default_rng(21)
    n, d, k = 240, 8, 4
    vecs = rng.normal(size=(n, d)).astype(np.float64)
    # planted near-duplicates (tiny perturbation -> cosine ~ 1)
    vecs[7] = vecs[3] + 1e-6
    vecs[55] = vecs[20] + 1e-6
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ds = ray.data.from_pandas(df).repartition(4)

    exact = mutual_knn_pairs(ds, k=k)
    ann = mutual_knn_pairs_ann(ds, k=k, num_lists=8, nprobe=2)
    ep = set(zip(exact["id_a"], exact["id_b"]))
    ap = set(zip(ann["id_a"], ann["id_b"]))
    assert ap <= ep  # precision 1.0 by construction
    assert (3, 7) in ap and (20, 55) in ap  # planted pairs found
