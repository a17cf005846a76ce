"""Distributed k-means over an embedding column (Lloyd's algorithm).

The curation use-case is SemDeDup-style cluster-then-filter (Abbas et
al. 2023): partition the corpus embedding space into k cells, then run
per-cluster dedup/selection.  The reference repo has no clustering;
this is part of the training-data operator set this engine adds.

Scale shape (every iteration):

* centroids are a tiny (k x d) float64 matrix, broadcast once via
  ``ray.put`` and read zero-copy in every task;
* each batch computes assignments with one matmul and emits AT MOST
  k x d sufficient-statistic rows (cluster, dim_idx, sum_e6, n) — the
  combiner pattern, so the shuffle per iteration carries
  O(num_blocks x k x d) counter rows, never vectors;
* the driver holds only the k x d stat table and the centroids.

Determinism: element sums are 1e-6 fixed-point int64 (float64
promotion then round-half-away-from-zero), so sums are exact and
order-free — the same batching-invariance trick as the engine's other
fixed-point aggregates, and what lets one Lloyd step be SQL-checkable.
int64 headroom: |element| <= ~100 -> 1e8 per value, overflow needs
~1e11 same-cluster-same-dim rows per PARTIAL; at that scale raise the
block count.

Empty clusters keep their previous centroid (standard Lloyd
convention).  Ties in the argmin go to the lowest cluster index (and
the SQL oracle orders by (dist, cid) to match).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _round_e6(x: np.ndarray) -> np.ndarray:
    """1e-6 fixed point, half away from zero (DuckDB ``round``)."""
    v = x.astype(np.float64) * 1_000_000.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def _assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid by squared L2; first (lowest) index on ties."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant per
    # row so argmin over (-2 x.c + ||c||^2) suffices — one matmul.
    scores = -2.0 * (m @ centroids.T) + (centroids * centroids).sum(
        axis=1
    )
    return np.argmin(scores, axis=1)


def seed_centroids(sf_path: str, k: int, emb_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """Deterministic init: the embeddings of ids 0..k-1, read via a
    predicate-pushdown parquet read (row-group pruned, k rows)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        sf_path, columns=[id_col, emb_col],
        filters=[(id_col, "<", k)],
    )
    order = np.argsort(np.asarray(t[id_col]))
    rows = t[emb_col].to_pylist()
    return np.stack(
        [np.asarray(rows[i], np.float64) for i in order]
    )


def kmeans_step_stats(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """One Lloyd E+partial-M step: assign every vector to its nearest
    centroid and return the per-(cluster, dim_idx) sufficient stats
    (sum_e6, n) — the exact fixed-point table a SQL oracle can verify
    and the input to the centroid update."""
    from .similarity import stack_list_column

    ref = ray.put(np.ascontiguousarray(centroids, np.float64))
    k, d = centroids.shape

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        c = ray.get(ref)
        m = stack_list_column(batch[emb_col]).astype(np.float64)
        a = _assign(m, c)
        e6 = _round_e6(m)
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, a, e6)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        live = np.flatnonzero(counts)
        df = pd.DataFrame(
            {
                "cluster": np.repeat(live, d),
                "dim_idx": np.tile(
                    np.arange(1, d + 1, dtype=np.int64), len(live)
                ),
                "sum_e6": sums[live].ravel(),
                "n": np.repeat(counts[live], d),
            }
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cluster", "dim_idx"])
        .sum(["sum_e6", "n"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns(["cluster", "dim_idx", "sum_e6", "n"])
        return pa.table(
            {
                "cluster": t["cluster"].combine_chunks().cast(pa.int64()),
                "dim_idx": t["dim_idx"].combine_chunks().cast(pa.int64()),
                "sum_e6": t["sum_e6"].combine_chunks().cast(pa.int64()),
                "n": t["n"].combine_chunks().cast(pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def kmeans_fit(
    ds: "ray.data.Dataset",
    centroids0: np.ndarray,
    iters: int = 5,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Full Lloyd loop.  Each iteration is one streaming pass whose
    shuffle carries only (cluster, dim) counter rows; the corpus never
    leaves its blocks.  Deterministic for a given init regardless of
    batching (fixed-point sums)."""
    cent = np.ascontiguousarray(centroids0, np.float64)
    k, d = cent.shape
    for _ in range(iters):
        stats = kmeans_step_stats(ds, cent, emb_col).to_pandas()
        nxt = cent.copy()
        for cl, grp in stats.groupby("cluster"):
            g = grp.sort_values("dim_idx")
            n = int(g["n"].iloc[0])
            if n > 0:
                nxt[int(cl)] = (
                    g["sum_e6"].to_numpy(np.float64) / 1e6 / n
                )
        cent = nxt
    return cent


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """Label every vector with its nearest centroid: (id, cluster)."""
    from .similarity import stack_list_column

    ref = ray.put(np.ascontiguousarray(centroids, np.float64))

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = stack_list_column(batch[emb_col]).astype(np.float64)
        a = _assign(m, c).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a, pa.int64()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow")


def kmeans_inertia(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    emb_col: str = "embedding",
) -> float:
    """Sum of squared distances to the assigned centroid (the Lloyd
    objective) — a one-float-per-block combiner reduction."""
    from .similarity import stack_list_column

    ref = ray.put(np.ascontiguousarray(centroids, np.float64))

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = stack_list_column(batch[emb_col]).astype(np.float64)
        a = _assign(m, c)
        diff = m - c[a]
        return pa.table(
            {"sse": pa.array([float((diff * diff).sum())], pa.float64())}
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum("sse")
    return float(agg["sum(sse)"] if isinstance(agg, dict) else agg)


def semdedup_pairs(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    tau: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs =
    vectors in the SAME k-means cluster with cosine >= tau.

    This is the method's own scale contract: k is chosen so clusters
    fit a worker (corpus/k vectors each), and the quadratic step runs
    only WITHIN a cluster — one coarse-partitioned groupby where each
    group does a vectorized normalized matmul.  The exchange carries
    (id, cluster, embedding) once; pairs leave as (id_a, id_b, cos_e6).
    """
    from .dedup import _coarse_group_apply
    from .similarity import stack_list_column

    ref = ray.put(np.ascontiguousarray(centroids, np.float64))

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = stack_list_column(batch[emb_col]).astype(np.float64)
        a = _assign(m, c).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a, pa.int64()),
                emb_col: batch[emb_col],
            }
        )

    labeled = ds.map_batches(label, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas()
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_cl: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for cl, grp in df.groupby("cluster"):
            ids = grp[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            m = np.stack(
                [np.asarray(v, np.float64) for v in grp[emb_col]]
            )[order]
            norms = np.sqrt((m * m).sum(axis=1))
            cos = (m @ m.T) / np.outer(norms, norms)
            ia, ib = np.nonzero(np.triu(cos >= tau, k=1))
            if not len(ia):
                continue
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_cl.append(np.full(len(ia), cl, np.int64))
            v = cos[ia, ib] * 1_000_000.0
            out_c.append(
                (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            )
        if not out_a:
            return pa.table(
                {
                    "vec_id_a": pa.array([], pa.int64()),
                    "vec_id_b": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "cos_e6": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "vec_id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "vec_id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cluster": pa.array(np.concatenate(out_cl), pa.int64()),
                "cos_e6": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    return _coarse_group_apply(labeled, "cluster", pairs, num_parts)


def semdedup_keep(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    tau: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """The SemDeDup pruned corpus: drop every vector that has a
    LOWER-id near-duplicate in its cluster (keep-min-id semantics, a
    deterministic one-pass stand-in for connected-component picking).
    Returns (vec_id, cluster) of the keep set."""
    from .dedup import _coarse_group_apply
    from .similarity import stack_list_column

    ref = ray.put(np.ascontiguousarray(centroids, np.float64))

    def label(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = stack_list_column(batch[emb_col]).astype(np.float64)
        a = _assign(m, c).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a, pa.int64()),
                emb_col: batch[emb_col],
            }
        )

    labeled = ds.map_batches(label, batch_format="pyarrow")

    def keep(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        ids_out: list[np.ndarray] = []
        cl_out: list[np.ndarray] = []
        for cl, grp in df.groupby("cluster"):
            ids = grp[id_col].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            m = np.stack(
                [np.asarray(v, np.float64) for v in grp[emb_col]]
            )[order]
            norms = np.sqrt((m * m).sum(axis=1))
            cos = (m @ m.T) / np.outer(norms, norms)
            # drop i if any j < i (sorted by id) has cos >= tau
            dup = (np.triu(cos >= tau, k=1)).any(axis=0)
            ids_keep = ids[~dup]
            ids_out.append(ids_keep)
            cl_out.append(np.full(len(ids_keep), cl, np.int64))
        return pa.table(
            {
                id_col: pa.array(
                    np.concatenate(ids_out) if ids_out else [],
                    pa.int64(),
                ),
                "cluster": pa.array(
                    np.concatenate(cl_out) if cl_out else [],
                    pa.int64(),
                ),
            }
        )

    return _coarse_group_apply(labeled, "cluster", keep, num_parts)
