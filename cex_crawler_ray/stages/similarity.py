"""Similarity search over embedding columns (``list<float>``).

* ``knn_brute_force``: exact cosine top-k — per-batch numpy matmul of
  the corpus against a ``ray.put``-broadcast query matrix, partial
  top-k per batch, merged at the driver.  This is the scale-correct
  brute-force shape: the corpus streams, only (k x queries) candidates
  leave each task.
* ``knn_lsh``: random-hyperplane LSH bucketing — candidate buckets only
  (probe shared-bucket points), exact re-rank on candidates.  The scale
  path when the corpus is too large to scan per query.
* ``knn_ivf``: IVF index — deterministic mini-k-means centroids
  (seeded, fixed iterations), corpus assigned to inverted lists via
  one ``map_batches`` pass against broadcast centroids; a query probes
  its ``nprobe`` nearest lists and exact-reranks only those.  The
  standard billion-scale ANN layout (FAISS-style), partitionable by
  list id.
* ``knn_pq``: product quantization (Jégou et al. 2011) — per-subspace
  codebooks trained on a hash-mod sample, corpus encoded to m uint8
  codes per vector (~64x smaller), asymmetric-distance shortlist +
  exact re-rank.  The memory-bound billion-scale path; composes with
  IVF partitioning in the standard IVF-PQ layout.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-300)


def stack_list_column(col) -> np.ndarray:
    """``list<float>`` column -> (n, dim) float64 matrix.

    Fast path: uniform-length lists reshape the flattened values buffer
    (zero-copy out of Arrow) instead of a per-row Python conversion —
    the difference between an Arrow-native and a Python-object batch
    kernel on embedding columns."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    try:
        offs = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
        if n and (offs == offs[0]).all() and offs[0] > 0:
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(n, int(offs[0])).astype(
                np.float64, copy=False
            )
    except (AttributeError, ValueError):
        pass
    return np.stack(
        [np.asarray(e, dtype=np.float64) for e in arr.to_pylist()]
    )


def col_to_numpy(col, dtype) -> np.ndarray:
    """Numeric Arrow column -> numpy, zero-copy when null-free."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(dtype, copy=False)


def knn_brute_force(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Exact cosine top-k for each query row.

    Returns a pyarrow Table (query_idx, rank, vec_id) with rank 1..k,
    ties broken by ascending id (deterministic).
    """
    q = _norm_rows(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = col_to_numpy(batch[id_col], np.int64)
        m = _norm_rows(stack_list_column(batch[emb_col]))
        sims = qm @ m.T  # (nq, batch)
        nq = sims.shape[0]
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(np.arange(nq, dtype=np.int64), kk)
        flat = part.ravel()
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(ids[flat], pa.int64()),
                "sim": pa.array(
                    np.take_along_axis(sims, part, axis=1).ravel(),
                    pa.float64(),
                ),
            }
        )

    # merge the per-batch partial top-k candidates on the driver
    # (candidate volume is k x queries x blocks — tiny)
    cand = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    return _merge_topk(cand, k)


def _merge_topk(cand_rows, k: int) -> pa.Table:
    """Driver merge of per-batch partial-top-k candidate rows
    (query_idx, vec_id, sim) — the only thing the driver ever holds is
    k x queries x blocks candidates, never corpus rows."""
    best: dict = {}
    for r in cand_rows:
        best.setdefault(r["query_idx"], []).append((r["sim"], r["vec_id"]))
    out_q, out_rank, out_id = [], [], []
    for qi in sorted(best):
        top = heapq.nsmallest(k, best[qi], key=lambda t: (-t[0], t[1]))
        for rank, (s, vid) in enumerate(top, 1):
            out_q.append(qi)
            out_rank.append(rank)
            out_id.append(vid)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
        }
    )


def _masked_partial_topk(
    qn: np.ndarray,
    probe_keys: list,
    ids: np.ndarray,
    mat: np.ndarray,
    keys: np.ndarray,
    k: int,
):
    """Per-batch partial top-k, each query restricted to rows whose
    bucket/list key is in its probe set.  Vectorized per query."""
    out_q, out_id, out_sim = [], [], []
    sims = qn @ mat.T
    for qi in range(len(qn)):
        mask = np.isin(keys, probe_keys[qi])
        if not mask.any():
            continue
        s = sims[qi][mask]
        cand_ids = ids[mask]
        kk = min(k, len(s))
        # deterministic even under sim ties: (sim desc, id asc)
        part = np.lexsort((cand_ids, -s))[:kk]
        out_q.extend([qi] * kk)
        out_id.extend(cand_ids[part].tolist())
        out_sim.extend(s[part].tolist())
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        }
    )


_LSH_PLANES_CACHE: dict = {}


def _lsh_planes(dim: int, num_planes: int = 12, seed: int = 7) -> np.ndarray:
    """Random-hyperplane matrix — a pure seeded function of the config,
    memoized per process (the former ``_LSHStage`` class carried a dead
    per-row ``__call__``; a plain helper can't be misused that way)."""
    key = (dim, num_planes, seed)
    if key not in _LSH_PLANES_CACHE:
        rng = np.random.RandomState(seed)
        _LSH_PLANES_CACHE[key] = rng.randn(num_planes, dim)
    return _LSH_PLANES_CACHE[key]


def _lsh_keys(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bit-packed hyperplane signs, fully vectorized (one matmul + one
    matvec, no per-bit Python loop)."""
    bits = (m @ planes.T) > 0
    weights = np.left_shift(
        np.int64(1), np.arange(bits.shape[1], dtype=np.int64)
    )
    return bits.astype(np.int64) @ weights


def _within_hamming(key: int, num_planes: int, radius: int) -> set:
    out = {key}
    frontier = {key}
    for _ in range(radius):
        nxt = set()
        for kk in frontier:
            for b in range(num_planes):
                nxt.add(kk ^ (1 << b))
        frontier = nxt - out
        out |= nxt
    return out


def knn_lsh(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    num_planes: int = 8,
    probe_radius: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Approximate top-k: only corpus points in LSH buckets within
    ``probe_radius`` bit-flips of the query's bucket are scored
    (multiprobe).  Recall < 1 by construction; pytest checks recall vs
    the brute-force oracle."""
    q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    dim = q.shape[1]
    planes = _lsh_planes(dim, num_planes)
    qkeys = _lsh_keys(q, planes)
    probe_keys = [
        np.array(
            sorted(_within_hamming(int(kk), num_planes, probe_radius)),
            dtype=np.int64,
        )
        for kk in qkeys
    ]
    wanted = np.array(
        sorted(set().union(*(set(p.tolist()) for p in probe_keys))),
        dtype=np.int64,
    )
    qn = _norm_rows(q)
    # one broadcast of (queries, probe sets, planes); each batch does
    # signature -> vectorized np.isin membership -> masked partial top-k
    # — no per-row Python filter, no corpus rows ever reach the driver
    bcast = ray.put((qn, probe_keys, wanted, planes))

    def partial(batch: pa.Table) -> pa.Table:
        qn, probes, wanted, planes = ray.get(bcast)
        m = stack_list_column(batch[emb_col])
        keys = _lsh_keys(m, planes)
        keep = np.isin(keys, wanted)
        if not keep.any():
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ids = col_to_numpy(batch[id_col], np.int64)[keep]
        return _masked_partial_topk(
            qn, probes, ids, _norm_rows(m[keep]), keys[keep], k
        )

    cand = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk_det(cand, k)


def _merge_topk_det(cand_rows, k: int) -> pa.Table:
    """Like ``_merge_topk`` but with the (sim desc, id asc)
    deterministic tie-break used by the approximate indexes."""
    best: dict = {}
    for r in cand_rows:
        best.setdefault(r["query_idx"], []).append((r["sim"], r["vec_id"]))
    out_q, out_rank, out_id = [], [], []
    for qi in sorted(best):
        top = sorted(best[qi], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (s, vid) in enumerate(top, 1):
            out_q.append(qi)
            out_rank.append(rank)
            out_id.append(vid)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
        }
    )


def _minibatch_kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Deterministic k-means on a (normalized) sample — index build."""
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def knn_ivf(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    num_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """IVF approximate top-k: probe the ``nprobe`` inverted lists whose
    centroids are nearest each query, exact cosine re-rank inside them.

    Index build is one corpus pass (assignment against broadcast
    centroids); at scale the inverted lists are the partitioning key for
    a bucketed Parquet layout exactly like the page store's.
    """
    q = _norm_rows(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))

    # build: sample-based centroids (deterministic), broadcast once
    sample_rows = ds.limit(4096).take_all()
    sample = _norm_rows(
        np.stack(
            [np.asarray(r[emb_col], dtype=np.float64) for r in sample_rows]
        )
    )
    centroids = _minibatch_kmeans(sample, num_lists)

    probe_lists = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    probe_keys = [
        np.asarray(sorted(row.tolist()), dtype=np.int64)
        for row in probe_lists
    ]
    wanted = np.array(
        sorted({int(x) for x in probe_lists.ravel()}), dtype=np.int64
    )
    # one broadcast of (queries, probe lists, centroids); each batch
    # assigns its rows to lists, keeps only probed-list members, and
    # emits a masked partial top-k per query — corpus rows never leave
    # their task, only k x queries x blocks candidates reach the driver
    bcast = ray.put((q, probe_keys, wanted, centroids))

    def partial(batch: pa.Table) -> pa.Table:
        qn, probes, wanted, cent = ray.get(bcast)
        m = _norm_rows(stack_list_column(batch[emb_col]))
        lists = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        keep = np.isin(lists, wanted)
        if not keep.any():
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ids = col_to_numpy(batch[id_col], np.int64)[keep]
        return _masked_partial_topk(
            qn, probes, ids, m[keep], lists[keep], k
        )

    cand = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk_det(cand, k)


# ------------------------------------------------- batch-query kNN
# The broadcast-matrix contract above fits a handful of query vectors;
# these variants take the QUERY SIDE as a Dataset too.  Shape: the
# query dataset is materialized into object-store blocks (the driver
# holds only block refs), every corpus task scores its batch against
# each query block (zero-copy shared-memory reads, normalized once per
# worker), and the per-(query-block x corpus-batch) partial top-k
# candidates are reduced per query by a coarse-partitioned groupby —
# the driver never holds anything larger than the k x queries result.

_QBLOCK_CACHE: dict = {}


def _cached_query_block(ref, query_id_col: str, emb_col: str):
    """Per-worker cache: query block ref -> (ids, normalized matrix).
    Normalization happens once per worker per block, not per corpus
    batch."""
    key = (ref.hex(), query_id_col, emb_col)
    ent = _QBLOCK_CACHE.get(key)
    if ent is None:
        if len(_QBLOCK_CACHE) > 512:
            _QBLOCK_CACHE.clear()
        t = ray.get(ref)
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t, preserve_index=False)
        qids = col_to_numpy(t[query_id_col], np.int64)
        qn = _norm_rows(stack_list_column(t[emb_col]))
        ent = (qids, qn)
        _QBLOCK_CACHE[key] = ent
    return ent


def _reduce_topk_per_query_ds(
    cand, k: int, num_parts: int = 64, exclude_self: bool = False
):
    """Dataset-returning distributed per-query top-k merge of candidate
    rows (query_id, vec_id, sim): coarse-partition on query_id, local
    sort/head per partition, deterministic (sim desc, vec_id asc)
    tie-break.  ``exclude_self`` drops query_id == vec_id rows (self
    matches in a self-kNN) BEFORE the head(k), so ranks are 1..k over
    true neighbors."""

    def partial_topk(batch: pa.Table) -> pa.Table:
        # combiner: top-k is associative, so each batch pre-cuts to at
        # most k rows per query BEFORE the groupby shuffle (candidates
        # arrive ~nprobe-lists-per-query wide; the cut shrinks the
        # exchange ~nprobe x and the merge's sort input with it)
        q = col_to_numpy(batch["query_id"], np.int64)
        v = col_to_numpy(batch["vec_id"], np.int64)
        s = col_to_numpy(batch["sim"], np.float64)
        if exclude_self:
            m = q != v
            q, v, s = q[m], v[m], s[m]
        if len(q) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((v, -s, q))
        qo = q[order]
        new_q = np.concatenate(([True], qo[1:] != qo[:-1]))
        starts = np.flatnonzero(new_q)
        lens = np.diff(np.concatenate((starts, [len(qo)])))
        local = np.arange(len(qo)) - np.repeat(starts, lens)
        keep = order[local < k]
        return pa.table(
            {
                "query_id": pa.array(q[keep], pa.int64()),
                "vec_id": pa.array(v[keep], pa.int64()),
                "sim": pa.array(s[keep], pa.float64()),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        q = col_to_numpy(batch["query_id"], np.uint64)
        part = pa.array(
            ((q * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_parts)).astype(
                np.int64
            ),
            pa.int64(),
        )
        return batch.append_column("_part", part)

    def merge_part(df):
        if exclude_self:
            df = df[df["query_id"].to_numpy() != df["vec_id"].to_numpy()]
        df = df.sort_values(
            ["query_id", "sim", "vec_id"], ascending=[True, False, True]
        )
        top = df.groupby("query_id", sort=False).head(k).copy()
        top["rank"] = top.groupby("query_id", sort=False).cumcount() + 1
        return top[["query_id", "rank", "vec_id"]]

    return (
        cand.map_batches(partial_topk, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(merge_part, batch_format="pandas")
    )


def _reduce_topk_per_query(cand, k: int, num_parts: int = 64) -> pa.Table:
    """Driver-collected variant of ``_reduce_topk_per_query_ds`` —
    only the final k x queries rows reach the driver."""
    out = _reduce_topk_per_query_ds(cand, k, num_parts)
    tables = [ray.get(r) for r in out.to_arrow_refs()]
    tables = [
        t
        if isinstance(t, pa.Table)
        else pa.Table.from_pandas(t, preserve_index=False)
        for t in tables
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(tables).combine_chunks()
    order = pa.compute.sort_indices(
        merged,
        sort_keys=[("query_id", "ascending"), ("rank", "ascending")],
    )
    return merged.take(order)


def _bf_cand_ds(
    corpus,
    queries,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
):
    """Candidate stream for Dataset-vs-Dataset exact cosine top-k:
    every corpus batch scored against every query block with one
    matmul + vectorized per-row argpartition — (query_id, vec_id, sim)
    rows, k per (query, corpus-batch)."""
    qrefs = list(queries.materialize().to_arrow_refs())

    def partial(batch: pa.Table) -> pa.Table:
        ids = col_to_numpy(batch[id_col], np.int64)
        m = _norm_rows(stack_list_column(batch[emb_col]))
        outs = []
        for ref in qrefs:
            qids, qn = _cached_query_block(ref, query_id_col, emb_col)
            if len(qids) == 0 or len(ids) == 0:
                continue
            sims = qn @ m.T
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            outs.append(
                pa.table(
                    {
                        "query_id": pa.array(
                            np.repeat(qids, kk), pa.int64()
                        ),
                        "vec_id": pa.array(ids[part.ravel()], pa.int64()),
                        "sim": pa.array(
                            np.take_along_axis(sims, part, axis=1).ravel(),
                            pa.float64(),
                        ),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.concat_tables(outs)

    return corpus.map_batches(partial, batch_format="pyarrow")


def knn_brute_force_ds(
    corpus,
    queries,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
):
    """Exact cosine top-k where BOTH sides are Datasets.

    Returns (query_id, rank, vec_id), rank 1..k, ties (sim desc, id
    asc).  Every corpus batch is scored against every query block with
    one matmul + a vectorized per-row argpartition — no per-query
    Python loop in the scoring path."""
    cand = _bf_cand_ds(corpus, queries, k, id_col, emb_col, query_id_col)
    return _reduce_topk_per_query(cand, k)


def mutual_knn_pairs(
    corpus,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Reciprocal nearest-neighbor (mutual top-k) pairs: (a, b) with b
    in a's exact cosine top-k AND a in b's — the RNN primitive used for
    high-precision embedding dedup/clustering (a mutual edge is far
    stronger evidence than a one-way hit).

    Distributed shape: self-kNN candidates via the blocked matmul
    stream (k+1 per block to absorb the self match, which is dropped
    before ranking in the reduce), per-query top-k as a DATASET, then
    the mutuality test as ONE co-partition hash join of the edge list
    against its own reversal — edge (src, dst) packs to src<<32|dst
    and joins dst<<32|src; ids must fit 32 bits (partition the id
    space per shard above that).  Only the mutual pairs (a small,
    dup-density-bounded set) reach the driver.
    """
    queries = _self_queries(corpus, id_col, emb_col)
    # k+1 candidates per block so dropping the self row leaves k
    cand = _bf_cand_ds(corpus, queries, k + 1, id_col, emb_col)
    topk = _reduce_topk_per_query_ds(cand, k, exclude_self=True)
    return _mutual_from_topk(topk)


def _self_queries(corpus, id_col: str, emb_col: str):
    """The corpus itself as a query Dataset (self-kNN shape)."""
    return corpus.map_batches(
        lambda b: pa.table(
            {
                "query_id": b[id_col],
                emb_col: b[emb_col],
            }
        ),
        batch_format="pyarrow",
    )


def _mutual_from_topk(topk):
    """Mutuality test shared by the exact and ANN variants: ONE
    co-partition hash join of the (query_id, vec_id) edge list against
    its own reversal — edge (src, dst) packs to src<<32|dst and joins
    dst<<32|src; ids must fit 32 bits (partition the id space per
    shard above that).  Only the mutual pairs (a small,
    dup-density-bounded set) reach the driver."""
    import pandas as pd

    from .join import hash_join

    # the edge list is consumed TWICE (itself + its reversal): pin the
    # k x queries rows in the object store so the candidate pipeline
    # upstream runs once, not once per consumer (measured ~2x on the
    # ANN path — Ray re-executes a lazy graph per consumer)
    if hasattr(topk, "materialize"):
        topk = topk.materialize()

    def pack(flip: bool, key_name: str):
        def fn(df: "pd.DataFrame") -> "pd.DataFrame":
            src = df["query_id"].to_numpy(np.int64)
            dst = df["vec_id"].to_numpy(np.int64)
            a, b = (dst, src) if flip else (src, dst)
            out = pd.DataFrame({key_name: (a << np.int64(32)) | b})
            if not flip:
                out["src"] = src
                out["dst"] = dst
            return out

        return fn

    edges = topk.map_batches(pack(False, "ek"), batch_format="pandas")
    rev = topk.map_batches(pack(True, "rk"), batch_format="pandas")
    mutual = hash_join(edges, rev, left_key="ek", right_key="rk")

    def keep_lower(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df[df["src"].to_numpy() < df["dst"].to_numpy()]
        return pd.DataFrame(
            {
                "id_a": df["src"].to_numpy(np.int64),
                "id_b": df["dst"].to_numpy(np.int64),
            }
        )

    out = mutual.map_batches(keep_lower, batch_format="pandas").to_pandas()
    return out.sort_values(["id_a", "id_b"], kind="mergesort").reset_index(
        drop=True
    )


def knn_ivf_ds(
    corpus,
    queries,
    k: int = 10,
    num_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
):
    """IVF approximate top-k with a query Dataset: same index build as
    ``knn_ivf`` (broadcast centroids), but probe-list assignment happens
    INSIDE the corpus tasks per query block, and scoring masks each
    query to its probed lists fully vectorized (no per-query loop)."""
    cand = _ivf_cand_ds(
        corpus, queries, k, num_lists, nprobe, id_col, emb_col,
        query_id_col,
    )
    return _reduce_topk_per_query(cand, k)


def _ivf_cand_ds(
    corpus,
    queries,
    k: int,
    num_lists: int,
    nprobe: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
):
    """IVF candidate stream (query_id, vec_id, sim), k per
    (query, corpus-batch): centroids trained on a bounded sample and
    broadcast via ``ray.put``; each corpus task assigns its rows to
    lists and scores each query only against its ``nprobe`` probed
    lists."""
    sample_rows = corpus.limit(4096).take_all()
    sample = _norm_rows(
        np.stack(
            [np.asarray(r[emb_col], dtype=np.float64) for r in sample_rows]
        )
    )
    centroids = _minibatch_kmeans(sample, num_lists)
    cent_ref = ray.put(centroids)
    qrefs = list(queries.materialize().to_arrow_refs())

    def partial(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        ids = col_to_numpy(batch[id_col], np.int64)
        m = _norm_rows(stack_list_column(batch[emb_col]))
        lists = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        outs = []
        for ref in qrefs:
            qids, qn = _cached_query_block(ref, query_id_col, emb_col)
            if len(qids) == 0 or len(ids) == 0:
                continue
            probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
            # (nq, nb) membership: does this corpus row's list appear in
            # the query's probe set?
            mask = (probes[:, :, None] == lists[None, None, :]).any(axis=1)
            if not mask.any():
                continue
            sims = np.where(mask, qn @ m.T, -np.inf)
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            svals = np.take_along_axis(sims, part, axis=1)
            valid = np.isfinite(svals).ravel()
            outs.append(
                pa.table(
                    {
                        "query_id": pa.array(
                            np.repeat(qids, kk)[valid], pa.int64()
                        ),
                        "vec_id": pa.array(
                            ids[part.ravel()][valid], pa.int64()
                        ),
                        "sim": pa.array(svals.ravel()[valid], pa.float64()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.concat_tables(outs)

    return corpus.map_batches(partial, batch_format="pyarrow")


def mutual_knn_pairs_ann(
    corpus,
    k: int = 5,
    num_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    verify_exact: bool = True,
):
    """ANN-backed reciprocal nearest-neighbor pairs — the 100-TB shape
    of ``mutual_knn_pairs``: candidate generation goes through the IVF
    index (each query scored only against its ``nprobe`` probed lists,
    ~nprobe/num_lists of the corpus) instead of the exact O(N^2)
    blocked matmul; the per-query top-k reduce and the co-partition
    reversal-join mutuality test are shared with the exact path.

    ``verify_exact`` (default): re-verify the surviving candidate
    pairs with EXACT top-k — but only for the nodes that appear in a
    candidate pair (a small, dup-density-bounded set M), so the check
    is one |M| x N blocked matmul, linear in the corpus, not N^2.
    With it, every returned pair is in the exact mutual-kNN set BY
    CONSTRUCTION (precision 1.0); recall remains that of the IVF
    candidates (high for genuinely close pairs — near-identical rows
    land in the same list — and measured against the exact oracle by
    ``mutual_knn_ann_guard``)."""
    queries = _self_queries(corpus, id_col, emb_col)
    cand = _ivf_cand_ds(
        corpus, queries, k + 1, num_lists, nprobe, id_col, emb_col
    )
    topk = _reduce_topk_per_query_ds(cand, k, exclude_self=True)
    pairs = _mutual_from_topk(topk)
    if not verify_exact or not len(pairs):
        return pairs

    node_arr = np.unique(
        np.concatenate(
            [pairs["id_a"].to_numpy(np.int64), pairs["id_b"].to_numpy(np.int64)]
        )
    )
    nodes_ref = ray.put(node_arr)

    def pick_nodes(batch: pa.Table) -> pa.Table:
        ids = col_to_numpy(batch[id_col], np.int64)
        keep = np.isin(ids, ray.get(nodes_ref))
        sub = batch.filter(pa.array(keep))
        return pa.table(
            {"query_id": sub[id_col], emb_col: sub[emb_col]}
        )

    node_queries = corpus.map_batches(pick_nodes, batch_format="pyarrow")
    exact_cand = _bf_cand_ds(corpus, node_queries, k + 1, id_col, emb_col)
    exact_topk = _reduce_topk_per_query(exact_cand, k + 1)
    q = col_to_numpy(exact_topk["query_id"], np.int64)
    v = col_to_numpy(exact_topk["vec_id"], np.int64)
    r = col_to_numpy(exact_topk["rank"], np.int64)
    # drop the self row, then keep rank <= k over true neighbors
    nonself = q != v
    q, v, r = q[nonself], v[nonself], r[nonself]
    # ranks were assigned with self included; recompute by stable order
    order = np.lexsort((r, q))
    q, v = q[order], v[order]
    newrank = np.ones(len(q), np.int64)
    if len(q):
        same = np.concatenate([[False], q[1:] == q[:-1]])
        idx = np.arange(len(q))
        start = np.maximum.accumulate(np.where(~same, idx, 0))
        newrank = idx - start + 1
    edge_ok = {(a, b) for a, b, rr in zip(q, v, newrank) if rr <= k}
    keep = [
        (a, b) in edge_ok and (b, a) in edge_ok
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    ]
    return pairs[keep].reset_index(drop=True)


# ------------------------------------------------------------------ PQ
def train_pq_codebooks(
    ds,
    m: int = 4,
    ksub: int = 32,
    sample_mod: int = 1,
    iters: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace codebooks for product quantization (Jégou et al.
    2011, "Product Quantization for Nearest Neighbor Search").

    Vectors are L2-normalized and split into ``m`` contiguous
    subspaces; each gets a deterministic k-means codebook of ``ksub``
    centroids trained on a hash-mod sample (``vec_id % sample_mod ==
    0``) — index training is driver-sized BY DESIGN (the standard ANN
    recipe: train on a bounded sample, encode the full corpus
    distributed).  Returns (m, ksub, dsub) float64.
    """

    def pick(batch: pa.Table) -> pa.Table:
        ids = col_to_numpy(batch[id_col], np.int64)
        return batch.filter(pa.array(ids % sample_mod == 0))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    sample = _norm_rows(
        np.stack([np.asarray(r[emb_col], np.float64) for r in rows])
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        # subspace vectors are NOT renormalized — k-means on raw
        # subvectors, distance = plain L2 (argmin ||x - c||)
        rng = np.random.RandomState(11 + j)
        cent = sub[
            rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)
        ].copy()
        for _ in range(iters):
            d2 = (
                (sub * sub).sum(1)[:, None]
                - 2.0 * (sub @ cent.T)
                + (cent * cent).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        if len(cent) < ksub:  # tiny corpus: pad with repeats
            cent = np.vstack([cent] * (ksub // len(cent) + 1))[:ksub]
        books[j] = cent
    return books


def pq_encode(
    ds,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Encode the corpus to (vec_id, codes list<uint8>) — m bytes per
    vector (dim x 8 bytes -> m bytes; 128x smaller at dim=64, m=4).
    One distributed pass against the broadcast codebooks."""
    m, ksub, dsub = codebooks.shape
    books_ref = ray.put(codebooks)

    def encode(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        mat = _norm_rows(stack_list_column(batch[emb_col]))
        n = mat.shape[0]
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            cent = books[j]
            d2 = (
                (sub * sub).sum(1)[:, None]
                - 2.0 * (sub @ cent.T)
                + (cent * cent).sum(1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table(
            {
                id_col: batch[id_col],
                "codes": pa.array(
                    list(codes), pa.list_(pa.uint8(), m)
                ),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def knn_pq(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    m: int = 8,
    ksub: int = 32,
    shortlist_mult: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """PQ-indexed approximate top-k with exact re-rank: asymmetric
    distance computation (ADC) over m-byte codes builds a shortlist of
    ``shortlist_mult * k`` candidates per query, then one filtered
    corpus scan exact-reranks just those — the billion-scale memory
    layout (codes are ~100x smaller than the vectors, so the scan
    stage reads bytes, not floats).

    Returns (query_idx, rank, vec_id), rank 1..k, ties (sim desc,
    id asc) — same contract as ``knn_brute_force``.
    """
    qm = _norm_rows(
        np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    )
    books = train_pq_codebooks(
        ds, m=m, ksub=ksub, id_col=id_col, emb_col=emb_col
    )
    codes_ds = pq_encode(ds, books, id_col=id_col, emb_col=emb_col)

    # per-query LUT[j, c] = q_j . c_{j,c}: approx inner product of the
    # normalized query with a reconstructed vector is the LUT sum
    dsub = books.shape[2]
    luts = np.empty((len(qm), m, ksub), np.float64)
    for j in range(m):
        luts[:, j, :] = qm[:, j * dsub : (j + 1) * dsub] @ books[j].T
    lut_ref = ray.put(luts)
    n_short = shortlist_mult * k

    def adc_partial(batch: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        ids = col_to_numpy(batch[id_col], np.int64)
        codes = stack_list_column(batch["codes"]).astype(np.int64)
        out_q, out_id, out_sim = [], [], []
        for qi in range(lt.shape[0]):
            sims = lt[qi, np.arange(m)[None, :], codes].sum(axis=1)
            kk = min(n_short, len(sims))
            part = np.lexsort((ids, -sims))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[part].tolist())
            out_sim.extend(sims[part].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    cand = codes_ds.map_batches(adc_partial, batch_format="pyarrow").take_all()
    # driver shortlist: n_short per query after the global ADC merge
    best: dict = {}
    for r in cand:
        best.setdefault(r["query_idx"], []).append((r["sim"], r["vec_id"]))
    shortlist: dict = {
        qi: set(
            vid
            for _, vid in heapq.nsmallest(
                n_short, rows, key=lambda t: (-t[0], t[1])
            )
        )
        for qi, rows in best.items()
    }
    all_ids = np.array(
        sorted(set().union(*shortlist.values())) if shortlist else [],
        np.int64,
    )
    ids_ref = ray.put(all_ids)
    q_ref = ray.put(qm)

    def rerank(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = col_to_numpy(batch[id_col], np.int64)
        if len(wanted):
            pos = np.searchsorted(wanted, ids)
            pos[pos >= len(wanted)] = 0
            mask = wanted[pos] == ids
        else:
            mask = np.zeros(len(ids), bool)
        t = batch.filter(pa.array(mask))
        if t.num_rows == 0:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        sids = col_to_numpy(t[id_col], np.int64)
        mat = _norm_rows(stack_list_column(t[emb_col]))
        qs = ray.get(q_ref)
        sims = qs @ mat.T
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(qs)):
            out_q.extend([qi] * len(sids))
            out_id.extend(sids.tolist())
            out_sim.extend(sims[qi].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    exact = ds.map_batches(rerank, batch_format="pyarrow").take_all()
    # keep only each query's own shortlist, then exact top-k
    rows = [
        r
        for r in exact
        if r["vec_id"] in shortlist.get(r["query_idx"], ())
    ]
    return _merge_topk(rows, k)
