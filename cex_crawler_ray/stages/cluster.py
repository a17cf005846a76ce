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
