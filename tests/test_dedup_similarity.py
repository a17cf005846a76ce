"""Dedup family + similarity search: recall/property tests that the SQL
oracle can't express (near-dup recall, LSH approximation quality)."""

import numpy as np
import pyarrow as pa
import pytest

import ray


@pytest.fixture(scope="module")
def corpus(ray_session):
    """60 base docs + exact dups of every 5th + near-dups of every 7th."""
    rng = np.random.RandomState(0)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(60):
        words = [vocab[j] for j in rng.randint(0, len(vocab), size=40)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    n = len(rows)
    for i in range(0, 60, 5):  # exact dups
        rows.append({"doc_id": 1000 + i, "text": rows[i]["text"]})
    for i in range(0, 60, 7):  # near dups: one word changed
        words = rows[i]["text"].split()
        words[3] = "omega"
        rows.append({"doc_id": 2000 + i, "text": " ".join(words)})
    return ray.data.from_items(rows)


def test_exact_dedup(corpus):
    from cex_crawler_ray.stages.dedup import exact_dedup

    out = exact_dedup(corpus).to_pandas()
    # 60 distinct base texts + 9 near-dups (distinct texts)
    assert len(out) == 60 + 9
    dup_groups = out[out["n_copies"] > 1]
    assert set(dup_groups["doc_id"]) == set(range(0, 60, 5))
    assert (dup_groups["n_copies"] == 2).all()


def test_minhash_recall_exact_and_near(corpus):
    from cex_crawler_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard

    pairs = minhash_lsh_pairs(corpus, num_perm=64, bands=16).to_pandas()
    found = {tuple(p) for p in pairs[["id_a", "id_b"]].values}
    # every exact dup must be a candidate (identical signatures)
    for i in range(0, 60, 5):
        assert (i, 1000 + i) in found
    # near-dups (jaccard ~0.9) should mostly be candidates with 16 bands
    near_found = sum((i, 2000 + i) in found for i in range(0, 60, 7))
    assert near_found >= 7  # 9 near-dup pairs; allow <=2 LSH misses


def test_ngram_jaccard_values():
    from cex_crawler_ray.stages.dedup import ngram_jaccard

    assert ngram_jaccard("abcdefghij", "abcdefghij") == 1.0
    assert ngram_jaccard("abcdefghij", "zzzzzzzzzz") == 0.0
    mid = ngram_jaccard("the quick brown fox jumps", "the quick brown fox leaps")
    assert 0.3 < mid < 0.9


def test_simhash_finds_dups(corpus):
    from cex_crawler_ray.stages.dedup import simhash_pairs

    pairs = simhash_pairs(corpus, max_hamming=3).to_pandas()
    found = {tuple(p) for p in pairs[["id_a", "id_b"]].values}
    for i in range(0, 60, 5):  # identical text -> hamming 0
        assert (i, 1000 + i) in found
    zero = pairs[pairs["hamming"] == 0]
    assert len(zero) >= 12  # all exact-dup pairs at distance 0


def test_embedding_dup_pairs(ray_session):
    from cex_crawler_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.RandomState(1)
    rows = [
        {"vec_id": i, "embedding": rng.randn(16).astype("float32").tolist()}
        for i in range(50)
    ]
    rows += [
        {"vec_id": 100 + i, "embedding": rows[i]["embedding"]}
        for i in range(0, 50, 10)
    ]
    ds = ray.data.from_items(rows)
    pairs = ds and embedding_dup_pairs(ds, threshold=0.999).to_pandas()
    got = {tuple(p) for p in pairs[["id_a", "id_b"]].values}
    assert got == {(i, 100 + i) for i in range(0, 50, 10)}


def test_embedding_grid_matches_broadcast(ray_session):
    """The grid-blocked default must equal the exact broadcast variant
    pair-for-pair — including near-threshold pairs straddling grid-cell
    boundaries."""
    from cex_crawler_ray.stages.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_broadcast,
    )

    rng = np.random.RandomState(3)
    base = rng.randn(120, 24)
    rows = [
        {"vec_id": i, "embedding": base[i].astype("float64").tolist()}
        for i in range(120)
    ]
    # near-dups at varying closeness: some above, some below threshold
    for j, i in enumerate(range(0, 120, 8)):
        noisy = base[i] + rng.randn(24) * (0.001 + 0.004 * (j % 4))
        rows.append({"vec_id": 500 + i, "embedding": noisy.tolist()})
    ds = ray.data.from_items(rows)
    grid = embedding_dup_pairs(ds, threshold=0.999).to_pandas()
    bcast = embedding_dup_pairs_broadcast(ds, threshold=0.999).to_pandas()
    g = {tuple(p) for p in grid[["id_a", "id_b"]].values}
    b = {tuple(p) for p in bcast[["id_a", "id_b"]].values}
    assert g == b
    assert len(g) > 0  # the tightest near-dups qualify


def test_verify_pairs_join(corpus):
    """Join-based pair verification == the driver-dict semantics."""
    from cex_crawler_ray.stages.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard,
        verify_pairs_exact,
        verify_pairs_jaccard,
    )

    texts = {r["doc_id"]: r["text"] for r in corpus.take_all()}
    pairs = minhash_lsh_pairs(corpus)
    exact = verify_pairs_exact(pairs, corpus).to_pandas()
    got = {tuple(p) for p in exact[["id_a", "id_b"]].values}
    want = {
        (a, b)
        for a, b in (
            tuple(p)
            for p in pairs.to_pandas()[["id_a", "id_b"]].values
        )
        if texts[a] == texts[b]
    }
    assert got == want

    jac = verify_pairs_jaccard(pairs, corpus, min_jaccard=0.8).to_pandas()
    got_j = {tuple(p) for p in jac[["id_a", "id_b"]].values}
    want_j = {
        (a, b)
        for a, b in (
            tuple(p)
            for p in pairs.to_pandas()[["id_a", "id_b"]].values
        )
        if ngram_jaccard(texts[a], texts[b]) >= 0.8
    }
    assert got_j == want_j
    assert got <= got_j  # exact dups always pass the jaccard bar


def test_verify_pairs_threshold_switch(corpus):
    """Forcing the co-partition join path (broadcast_max_pairs=0) must
    produce the identical verified pair set as the broadcast path —
    the automatic switch can never change results, only where the
    candidate texts live."""
    from cex_crawler_ray.stages.dedup import (
        minhash_lsh_pairs,
        verify_pairs_exact,
        verify_pairs_jaccard,
    )

    pairs = minhash_lsh_pairs(corpus).materialize()

    def pset(tbl):
        return set(
            zip(tbl["id_a"].to_pylist(), tbl["id_b"].to_pylist())
        )

    bc = verify_pairs_exact(pairs, corpus, broadcast_max_pairs=10**9)
    jn = verify_pairs_exact(pairs, corpus, broadcast_max_pairs=0)
    assert pset(jn) == pset(bc) and len(pset(bc)) > 0

    bc_j = verify_pairs_jaccard(
        pairs, corpus, min_jaccard=0.8, broadcast_max_pairs=10**9
    )
    jn_j = verify_pairs_jaccard(
        pairs, corpus, min_jaccard=0.8, broadcast_max_pairs=0
    )
    assert pset(jn_j) == pset(bc_j)


def test_minhash_incremental_index(ray_session, tmp_path):
    """Persistent band index across a growing corpus: run 2 computes
    signatures only for the NEW docs (generation-0 files untouched,
    generation-1 band rows cover only new ids) and the returned pair
    set equals a from-scratch run over the grown corpus."""
    import glob
    import os

    import pyarrow.parquet as pq

    from cex_crawler_ray.stages.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    rng = np.random.RandomState(9)
    vocab = "alpha beta gamma delta epsilon zeta eta theta".split()

    def doc(i):
        words = [vocab[j] for j in rng.randint(0, len(vocab), size=30)]
        return {"doc_id": i, "text": " ".join(words)}

    batch1 = [doc(i) for i in range(40)]
    batch1 += [{"doc_id": 500 + i, "text": batch1[i]["text"]} for i in range(0, 40, 5)]
    batch2 = [doc(100 + i) for i in range(30)]
    # cross-batch dups: new docs duplicating OLD texts must pair too
    batch2 += [{"doc_id": 900 + i, "text": batch1[i]["text"]} for i in range(0, 40, 8)]

    idx = str(tmp_path / "band_index")

    def pset(ds):
        df = ds.to_pandas()
        return set(map(tuple, df[["id_a", "id_b"]].values))

    ds1 = ray.data.from_items(batch1)
    p1 = pset(minhash_lsh_pairs_incremental(ds1, idx))
    assert p1 == pset(minhash_lsh_pairs(ds1))

    gen0_files = sorted(glob.glob(os.path.join(idx, "gen=0", "*.parquet")))
    assert gen0_files
    gen0_stat = [(f, os.path.getmtime(f), os.path.getsize(f)) for f in gen0_files]

    ds_full = ray.data.from_items(batch1 + batch2)
    p2 = pset(minhash_lsh_pairs_incremental(ds_full, idx))
    # equals from-scratch over the grown corpus
    assert p2 == pset(minhash_lsh_pairs(ds_full))
    assert p2 > p1  # cross-batch dups found
    # generation 0 untouched (signatures not recomputed)...
    assert [
        (f, os.path.getmtime(f), os.path.getsize(f)) for f in gen0_files
    ] == gen0_stat
    # ...and generation 1 indexed ONLY the new doc ids
    new_ids = {r["doc_id"] for r in batch2}
    gen1 = pq.read_table(os.path.join(idx, "gen=1"))
    assert set(gen1["doc_id"].to_pylist()) == new_ids


def test_knn_batch_query_dataset(ray_session):
    """Batch-query kNN: 1,000 queries as a Dataset against a corpus
    Dataset.  Brute-force must equal the local numpy oracle exactly;
    IVF-ds recall vs brute force >= 0.6.  The driver-side result is
    exactly k x queries rows."""
    from cex_crawler_ray.stages.similarity import (
        knn_brute_force_ds,
        knn_ivf_ds,
    )

    rng = np.random.RandomState(5)
    n, nq, dim, k = 600, 1000, 16, 5
    mat = rng.randn(n, dim)
    qmat = rng.randn(nq, dim)
    corpus = ray.data.from_items(
        [
            {"vec_id": i, "embedding": mat[i].tolist()}
            for i in range(n)
        ]
    ).repartition(8)
    queries = ray.data.from_items(
        [
            {"query_id": i, "embedding": qmat[i].tolist()}
            for i in range(nq)
        ]
    ).repartition(4)

    out = knn_brute_force_ds(corpus, queries, k=k).to_pandas()
    assert len(out) == nq * k
    # numpy oracle
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sims = qn @ mn.T
    for qi in (0, 17, 500, 999):
        expect = sorted(range(n), key=lambda i: (-sims[qi, i], i))[:k]
        got = out[out["query_id"] == qi].sort_values("rank")[
            "vec_id"
        ].tolist()
        assert got == expect
    # full equality of the top-1 column (cheap full sweep)
    top1 = (
        out[out["rank"] == 1].sort_values("query_id")["vec_id"].to_numpy()
    )
    expect_top1 = np.lexsort((np.arange(n)[None, :].repeat(nq, 0), -sims))[
        :, 0
    ]
    assert (top1 == expect_top1).all()

    ivf = knn_ivf_ds(corpus, queries, k=k, num_lists=8, nprobe=3).to_pandas()
    brute = {
        (r.query_id, r.vec_id) for r in out.itertuples()
    }
    approx = {(r.query_id, r.vec_id) for r in ivf.itertuples()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.6, recall


def test_knn_brute_force_matches_numpy(ray_session):
    from cex_crawler_ray.stages.similarity import knn_brute_force

    rng = np.random.RandomState(2)
    mat = rng.randn(200, 32)
    ds = ray.data.from_items(
        [
            {"vec_id": i, "embedding": mat[i].astype("float32").tolist()}
            for i in range(200)
        ]
    )
    q = mat[7]
    # numpy oracle over the same float32-rounded data
    m32 = mat.astype("float32").astype("float64")
    q32 = m32[7]
    sims = (m32 / np.linalg.norm(m32, axis=1, keepdims=True)) @ (
        q32 / np.linalg.norm(q32)
    )
    expect = sorted(range(200), key=lambda i: (-sims[i], i))[:10]
    out = knn_brute_force(ds, q32[None, :], k=10).to_pandas()
    assert out["vec_id"].tolist() == expect


def test_knn_lsh_recall(ray_session):
    from cex_crawler_ray.stages.similarity import knn_brute_force, knn_lsh

    rng = np.random.RandomState(3)
    mat = rng.randn(500, 32).astype("float32").astype("float64")
    ds = ray.data.from_items(
        [
            {"vec_id": i, "embedding": mat[i].tolist()}
            for i in range(500)
        ]
    )
    q = mat[11]
    exact = set(
        knn_brute_force(ds, q[None, :], k=10).to_pandas()["vec_id"]
    )
    approx = knn_lsh(ds, q[None, :], k=10).to_pandas()
    assert len(approx) == 10
    recall = len(set(approx["vec_id"]) & exact) / 10
    assert recall >= 0.5  # multiprobe radius 2 over 8 planes


def test_knn_ivf_recall_and_self_hit(ray_session):
    from cex_crawler_ray.stages.similarity import knn_brute_force, knn_ivf

    rng = np.random.RandomState(5)
    # clustered corpus (IVF's favourable regime)
    centers = rng.randn(8, 32) * 4
    mat = np.vstack(
        [centers[i % 8] + rng.randn(32) for i in range(400)]
    )
    ds = ray.data.from_items(
        [
            {"vec_id": i, "embedding": mat[i].astype("float32").tolist()}
            for i in range(400)
        ]
    )
    q = mat[17].astype("float32").astype("float64")
    exact = set(
        knn_brute_force(ds, q[None, :], k=10).to_pandas()["vec_id"]
    )
    approx = knn_ivf(ds, q[None, :], k=10, num_lists=16, nprobe=4).to_pandas()
    assert len(approx) == 10
    assert 17 in set(approx["vec_id"])  # query point always found
    recall = len(set(approx["vec_id"]) & exact) / 10
    assert recall >= 0.7


def test_asof_join_semantics(ray_session):
    """Backward as-of: greatest right_ts <= left_ts per key; inner
    semantics drop unmatched left rows."""
    import datetime as dt

    import pyarrow as pa

    from cex_crawler_ray.stages.join import asof_join

    def ts(d):
        return dt.datetime(2024, 1, d)

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3], pa.int64()),
                "lts": pa.array([ts(5), ts(1), ts(3), ts(9)]),
                "lid": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array([1, 1, 2], pa.int64()),
                "rts": pa.array([ts(2), ts(4), ts(3)]),
                "rid": pa.array([100, 101, 102], pa.int64()),
            }
        )
    )
    out = (
        asof_join(left, right, "k", "rk", "lts", "rts")
        .to_pandas()
        .sort_values("lid")
    )
    # lid 10 (k=1, t=5) -> rid 101 (t=4); lid 11 (t=1) unmatched;
    # lid 12 (k=2, t=3) -> rid 102 (exact match allowed); k=3 unmatched
    assert out["lid"].tolist() == [10, 12]
    assert out["rid"].tolist() == [101, 102]


def test_range_join_broadcast_edges(ray_session):
    import pyarrow as pa

    from cex_crawler_ray.stages.join import range_join_broadcast

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "v": pa.array([0, 999, 1000, 19999, -5], pa.int64()),
            }
        )
    )
    ranges = pa.table(
        {
            "lo": pa.array([0, 1000], pa.int64()),
            "hi": pa.array([1000, 20000], pa.int64()),
            "tier": pa.array(["a", "b"]),
        }
    )
    out = (
        range_join_broadcast(ds, ranges, "v")
        .to_pandas()
        .sort_values("id")
    )
    # half-open [lo, hi): 0->a, 999->a, 1000->b, 19999->b; -5 dropped
    assert out["id"].tolist() == [1, 2, 3, 4]
    assert out["tier"].tolist() == ["a", "a", "b", "b"]


def test_coarse_group_apply_negative_and_uint_keys(ray_session):
    """Negative int64 keys and uint64 keys >= 2^63 both partition
    whole (every key's rows land in exactly one fn invocation)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray
    from cex_crawler_ray.stages.dedup import _coarse_group_apply

    def dedup_count(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        g = df.groupby("k", as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    # negative int64 keys, each key split across input blocks
    ks = np.array([-5, -5, -64, -64, 3, 3, -1, -1], np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"k": ks})).repartition(4)
    out = (
        _coarse_group_apply(ds, "k", dedup_count, 8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [-64, -5, -1, 3]
    assert out["n"].tolist() == [2, 2, 2, 2]

    # uint64 keys above 2^63
    big = np.array([2**63 + 7, 2**63 + 7, 2**64 - 1, 2**64 - 1], np.uint64)
    tbl = pa.table({"k": pa.array(big, pa.uint64())})
    ds2 = ray.data.from_arrow(tbl).repartition(2)
    out2 = _coarse_group_apply(ds2, "k", dedup_count, 8).to_pandas()
    assert sorted(out2["n"].tolist()) == [2, 2]
