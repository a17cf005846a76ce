"""Consistent-hash ring for shard-state rebalance (Karger et al.
STOC'97) — the primitive that makes growing the seen-filter / frontier
shard pool cheap on a real cluster: with a vnode ring, going from N to
N+1 shards moves ~1/(N+1) of the keys, where the naive ``hash % N``
assignment (what ``SeenFilterPool`` uses for a FIXED pool) would
remap ~N/(N+1) of them and force a near-total state migration.

Hashing is the repo-wide md5 convention (``stages/dsir._bucket_of``)
so a DuckDB twin reproduces ring positions and assignments
byte-identically.  Assignment is the classic successor rule: a key
goes to the owner of the first ring position STRICTLY greater than the
key's hash, wrapping to the smallest position.

Scale shape: the ring (N x vnodes ints) broadcasts once; per-batch
assignment is one ``np.searchsorted`` against the sorted position
array; the rebalance matrix folds to (shard_old, shard_new, n)
partials — at most N x M rows per batch — and driver-merges.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def build_ring(n_shards: int, vnodes: int = 32):
    """Sorted (positions, owners) arrays for ``n_shards`` x ``vnodes``."""
    pos = np.empty(n_shards * vnodes, dtype=np.int64)
    own = np.empty(n_shards * vnodes, dtype=np.int64)
    i = 0
    for s in range(n_shards):
        for v in range(vnodes):
            pos[i] = _h32(f"{s}:{v}")
            own[i] = s
            i += 1
    order = np.argsort(pos, kind="stable")
    return pos[order], own[order]


def ring_assign(key_hashes: np.ndarray, pos: np.ndarray, own: np.ndarray):
    """Successor-rule owner per key: first position > hash, wrapping."""
    idx = np.searchsorted(pos, key_hashes, side="right")
    return own[idx % len(pos)]


def rebalance_matrix(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    n_old: int = 8,
    n_new: int = 9,
    vnodes: int = 32,
) -> pd.DataFrame:
    """(shard_old, shard_new, n) key-movement matrix for growing the
    pool from ``n_old`` to ``n_new`` shards.  Keys are md5 hashes of
    the stringified id (DuckDB-reproducible); both rings broadcast
    once; the matrix is shard-pair bounded so partials driver-merge."""
    from ..stages.dedup import driver_merge_sum

    po, oo = build_ring(n_old, vnodes)
    pn, on = build_ring(n_new, vnodes)
    rings = ray.put((po, oo, pn, on))

    def partial(batch: pa.Table) -> pa.Table:
        po_, oo_, pn_, on_ = ray.get(rings)
        ids = batch[id_col].to_pylist()
        kh = np.fromiter(
            (_h32(str(i)) for i in ids), np.int64, len(ids)
        )
        a = ring_assign(kh, po_, oo_)
        b = ring_assign(kh, pn_, on_)
        key = a * n_new + b
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "shard_old": pa.array(u // n_new, pa.int64()),
                "shard_new": pa.array(u % n_new, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    merged = driver_merge_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["shard_old", "shard_new"],
        ["n"],
    )
    merged["n"] = merged["n"].astype("int64")
    return (
        merged.sort_values(["shard_old", "shard_new"])
        .reset_index(drop=True)
    )
