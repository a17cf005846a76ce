"""Mergeable sketches: HyperLogLog distinct counting + bottom-k
quantile sampling.

The reference has no approximate sketches (SURVEY.md §2.6 "absent");
at 10^10-URL scale exact distinct counts (urls seen, hosts touched,
unique tokens) are shuffle-heavy, while an HLL is one `map_batches`
pass producing a few-KB partial per block, merged associatively —
no shuffle at all.

Flajolet et al. 2007 HLL with the standard bias correction; register
hashing reuses the engine's 64-bit content hashes, so estimates are
deterministic across runs and partitionings (merge is a register-wise
max — order-independent).

Bottom-k quantile sampling: the rows with the k smallest
``hash(row_id)`` values form a uniform k-row sample whose selection is
DETERMINISTIC and MERGEABLE (the bottom-k of a union is the bottom-k
of the parts' bottom-k's — Cohen & Kaplan 2007 bottom-k sketches);
quantiles of the sample estimate quantiles of the stream with
O(1/sqrt(k)) error, exact whenever a group has <= k rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = position of the first 1-bit in the remaining 64-p bits
        # (1-based), vectorized leading-zero count via bit shifts
        rank = np.zeros(len(h), dtype=np.uint8)
        rem = (h << np.uint64(self.p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        for r in range(1, 64 - self.p + 1):
            top = (rem >> np.uint64(63)) & np.uint64(1)
            rank[(rank == 0) & (top == 1)] = r
            rem = (rem << np.uint64(1)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            if not (rank == 0).any():
                break
        rank[rank == 0] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        z = 1.0 / np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m * z
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        return e


def approx_distinct(
    ds, col: str, p: int = 12, hash_fn=None
) -> float:
    """Approximate distinct count of a column: per-batch partial HLLs
    (a few KB each), associative register-max merge on the driver."""
    import hashlib

    def default_hash(values) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        str(v).encode("utf-8"), digest_size=8
                    ).digest(),
                    "big",
                )
                for v in values
            ),
            dtype=np.uint64,
            count=len(values),
        )

    hf = hash_fn or default_hash

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_hashes(hf(batch[col].to_pylist()))
        return pa.table(
            {"registers": pa.array([hll.registers.tobytes()], pa.binary())}
        )

    merged = HyperLogLog(p)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        other = HyperLogLog(p)
        other.registers = np.frombuffer(
            row["registers"], dtype=np.uint8
        ).copy()
        merged = merged.merge(other)
    return merged.estimate()


def _id_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of integer row ids (splitmix64-style)."""
    h = np.asarray(ids, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        h = (h + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
            0xBF58476D1CE4E5B9
        )
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def approx_group_quantile(
    ds,
    group_col: str,
    value_col: str,
    id_col: str,
    q: float = 0.5,
    k: int = 1024,
):
    """Per-group approximate quantile via bottom-k row sampling.

    Stage 1 (map_batches): per block, per group, keep the k rows with
    the smallest ``hash(id)`` — each partial is <= k rows per (block,
    group).  Stage 2 (coarse-partitioned vectorized merge): re-select
    the global bottom-k per group, then take the discrete q-quantile of
    the sampled values.  One small shuffle of <= k-row partials; exact
    when a group has <= k rows; deterministic (pure function of ids).

    Returns a pyarrow Table (group, approx_quantile, sample_size).
    """
    import pandas as pd

    from .dedup import _coarse_group_apply

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                group_col: df[group_col],
                "_h": _id_hash(df[id_col].to_numpy()),
                value_col: df[value_col],
            }
        )
        return (
            out.sort_values("_h", kind="mergesort")
            .groupby(group_col, sort=False)
            .head(k)
        )

    def final(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        groups, quants, sizes = [], [], []
        for g, grp in df.groupby(group_col, sort=False):
            sample = grp.sort_values("_h", kind="mergesort").head(k)
            vals = np.sort(sample[value_col].to_numpy())
            idx = int((len(vals) - 1) * q)
            groups.append(g)
            quants.append(vals[idx])
            sizes.append(len(vals))
        return pa.table(
            {
                group_col: pa.array(groups),
                "approx_quantile": pa.array(quants),
                "sample_size": pa.array(sizes, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")

    # coarse-partition on a group-content hash so the merge stays
    # vectorized even with many groups
    import hashlib as _hl

    def add_gkey(batch: pa.Table) -> pa.Table:
        keys = np.fromiter(
            (
                int.from_bytes(
                    _hl.blake2b(
                        str(v).encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                for v in batch[group_col].to_pylist()
            ),
            dtype=np.uint64,
            count=batch.num_rows,
        )
        return batch.append_column("_gkey", pa.array(keys, pa.uint64()))

    out = _coarse_group_apply(
        partials.map_batches(add_gkey, batch_format="pyarrow"),
        "_gkey",
        lambda t: final(t.drop_columns(["_gkey"])),
        num_parts=32,
    )
    return out


# ------------------------------------------------------- heavy hitters
def _mg_truncate(keys: "np.ndarray", counts: "np.ndarray", k: int):
    """Misra-Gries truncation: keep at most k counters by subtracting
    the (k+1)-th largest count from everything.  Returns (keys, counts,
    delta) — delta is the decrement applied (this summary's
    contribution to the global underestimate bound)."""
    if len(keys) <= k:
        return keys, counts, 0
    thresh = int(
        np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    )
    keep = counts > thresh
    return keys[keep], counts[keep] - thresh, thresh


def mg_heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 16,
    driver_merge_max_blocks: int = 4096,
) -> tuple[pa.Table, int, int]:
    """Misra-Gries heavy hitters over an int64 key stream (Misra &
    Gries 1982; mergeability per Agarwal et al. 2012 "Mergeable
    Summaries").

    Returns ``(table, delta_total, n_total)``: at most ``k``
    (key, est_count)
    rows, est_count an UNDERESTIMATE of the true count by at most
    ``delta_total`` — and every key whose true count exceeds
    ``delta_total`` (itself <= N/(k+1)) is GUARANTEED present.

    Scale shape: each batch reduces to <= k+1 counter rows (the +1 is
    a reserved delta row, key = -1), the groupby shuffle carries only
    those, and the merged table (<= blocks x k rows) is truncated once
    more on the driver.  The raw stream never leaves its batch and
    nothing unbounded reaches the driver.
    """
    DELTA_KEY = -1  # caller keys must be >= 0
    TOTAL_KEY = -2  # carries the stream length through the same groupby

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        u, c = np.unique(v, return_counts=True)
        u, c, delta = _mg_truncate(u, c.astype(np.int64), k)
        return pa.table(
            {
                "key": pa.array(
                    np.concatenate([u, [DELTA_KEY, TOTAL_KEY]]), pa.int64()
                ),
                "cnt": pa.array(
                    np.concatenate([c, [delta, len(v)]]), pa.int64()
                ),
            }
        )

    part_ds = ds.map_batches(partial, batch_format="pyarrow")
    refs = part_ds.to_arrow_refs()
    if len(refs) <= driver_merge_max_blocks:
        # partials are <= k+2 rows per block, so below the block-count
        # threshold a driver-side numpy merge replaces the all-to-all
        # groupby (a multi-second fixed cost at sandbox scale); above
        # it the partials (already computed, zero re-work) feed the
        # shuffle path so the driver never holds an unbounded table
        tbl = pa.concat_tables(
            ray.get(refs), promote_options="default"
        )
    else:
        merged = (
            ray.data.from_arrow_refs(refs).groupby("key").sum("cnt")
        )
        tbl = pa.concat_tables(
            ray.get(merged.to_arrow_refs()), promote_options="default"
        ).rename_columns(["key", "cnt"])
    keys = tbl["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(refs) <= driver_merge_max_blocks and len(keys):
        u, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, cnts)
        keys, cnts = u, s
    is_delta = keys == DELTA_KEY
    is_total = keys == TOTAL_KEY
    delta_total = int(cnts[is_delta].sum()) if is_delta.any() else 0
    n_total = int(cnts[is_total].sum()) if is_total.any() else 0
    real = ~(is_delta | is_total)
    keys, cnts = keys[real], cnts[real]
    keys, cnts, d2 = _mg_truncate(keys, cnts, k)
    delta_total += d2
    order = np.lexsort((keys, -cnts))
    out = pa.table(
        {
            "key": pa.array(keys[order], pa.int64()),
            "est_count": pa.array(cnts[order], pa.int64()),
        }
    )
    return out, delta_total, n_total


def exact_key_counts(ds: "ray.data.Dataset", col: str) -> pa.Table:
    """Exact (key, n) counts — partial ``np.unique`` per batch, then a
    groupby carrying one row per (batch, key).  The heavy hitters'
    oracle companion."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .sum("n")
    )
    return pa.concat_tables(
        ray.get(merged.to_arrow_refs()), promote_options="default"
    ).rename_columns(["key", "n"])


# ------------------------------------------- exact distributed selection
def exact_global_quantile(
    ds: "ray.data.Dataset",
    col: str = "cents",
    q: float = 0.5,
    shift: int = 16,
) -> int:
    """EXACT global order statistic without a global sort: two counting
    passes of histogram descent (the distributed selection algorithm).

    Pass 1 histograms values into ``2^shift``-wide coarse buckets (one
    (bucket, count) row per batch-bucket through the shuffle; the
    merged histogram — bounded by value spread / 2^shift — reaches the
    driver, which locates the bucket containing the target rank).
    Pass 2 exactly counts the DISTINCT values inside that one bucket
    (≤ 2^shift of them) via a filtered scan.  Rank convention is
    ``ceil(q * n) - 1`` 0-based in plain IEEE double arithmetic —
    empirically pinned to DuckDB ``quantile_disc`` across odd/even n
    and boundary q (test probes n ∈ {4,5,7,10,997,1000}).
    """
    import math

    from .dedup import driver_merge_sum

    # both counting passes consume ds — pin it so upstream work runs
    # once; the (bucket, cnt) / (val, cnt) partials are driver-bound
    # aggregates, so merge them on the driver (no shuffle rounds)
    ds = ds.materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        b, c = np.unique(v >> shift, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = driver_merge_sum(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["bucket"],
        ["cnt"],
    ).sort_values("bucket")
    b = hist["bucket"].to_numpy(dtype=np.int64)
    c = hist["cnt"].to_numpy(dtype=np.int64)
    n = int(c.sum())
    if n == 0:
        raise ValueError("empty input")
    rank = max(math.ceil(q * n) - 1, 0)
    cum = np.cumsum(c)
    bi = int(np.searchsorted(cum, rank + 1))
    target_bucket = int(b[bi])
    rank_in_bucket = rank - (int(cum[bi - 1]) if bi > 0 else 0)

    def in_bucket(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = v[(v >> shift) == target_bucket]
        u, cc = np.unique(v, return_counts=True)
        return pa.table(
            {
                "val": pa.array(u, pa.int64()),
                "cnt": pa.array(cc.astype(np.int64), pa.int64()),
            }
        )

    t2 = driver_merge_sum(
        ds.map_batches(in_bucket, batch_format="pyarrow"),
        ["val"],
        ["cnt"],
    ).sort_values("val")
    v = t2["val"].to_numpy(dtype=np.int64)
    c2 = t2["cnt"].to_numpy(dtype=np.int64)
    cum2 = np.cumsum(c2)
    return int(v[int(np.searchsorted(cum2, rank_in_bucket + 1))])


def exact_global_quantile_cont(
    ds: "ray.data.Dataset",
    col: str = "cents",
    q: float = 0.5,
    shift: int = 16,
) -> float:
    """EXACT interpolated global quantile (SQL ``quantile_cont`` /
    numpy ``linear``, type-7): h = q*(n-1); result interpolates the
    floor(h)-th and ceil(h)-th order statistics.

    Both order statistics come from ONE histogram pass (the same
    two-pass histogram descent as ``exact_global_quantile``) plus one
    filtered in-bucket count per distinct target bucket — at most two
    extra scans, usually one.  The interpolation arithmetic mirrors
    the engines' double semantics (h and the blend computed in IEEE
    double), pinned to DuckDB by a convention-probe pytest.
    """
    import math

    from .dedup import driver_merge_sum

    # the histogram pass plus one or two in-bucket passes consume ds —
    # pin it; partials are driver-bound, merge them on the driver
    ds = ds.materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        b, c = np.unique(v >> shift, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = driver_merge_sum(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["bucket"],
        ["cnt"],
    ).sort_values("bucket")
    b = hist["bucket"].to_numpy(dtype=np.int64)
    c = hist["cnt"].to_numpy(dtype=np.int64)
    n = int(c.sum())
    if n == 0:
        raise ValueError("empty input")
    h = q * (n - 1)
    rank_lo = int(math.floor(h))
    rank_hi = int(math.ceil(h))
    cum = np.cumsum(c)

    def order_stat(rank: int) -> int:
        bi = int(np.searchsorted(cum, rank + 1))
        target_bucket = int(b[bi])
        rank_in_bucket = rank - (int(cum[bi - 1]) if bi > 0 else 0)

        def in_bucket(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            v = v[(v >> shift) == target_bucket]
            u, cc = np.unique(v, return_counts=True)
            return pa.table(
                {
                    "val": pa.array(u, pa.int64()),
                    "cnt": pa.array(cc.astype(np.int64), pa.int64()),
                }
            )

        t2 = driver_merge_sum(
            ds.map_batches(in_bucket, batch_format="pyarrow"),
            ["val"],
            ["cnt"],
        ).sort_values("val")
        v = t2["val"].to_numpy(dtype=np.int64)
        c2 = t2["cnt"].to_numpy(dtype=np.int64)
        cum2 = np.cumsum(c2)
        return int(v[int(np.searchsorted(cum2, rank_in_bucket + 1))])

    x_lo = order_stat(rank_lo)
    x_hi = x_lo if rank_hi == rank_lo else order_stat(rank_hi)
    return x_lo + (h - rank_lo) * (x_hi - x_lo)


def exact_group_quantile_descent(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str = "cents",
    q: float = 0.5,
    shift: int = 16,
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """EXACT per-group order statistic WITHOUT materializing any group:
    the keyed generalization of ``exact_global_quantile``'s histogram
    descent, for when a single group no longer fits one worker (the
    documented assumption of the ``map_groups`` quantiles).

    Pass 1: (key, coarse-bucket) count combiner; the merged histogram —
    bounded by keys x value-spread / 2^shift, an aggregate, never rows —
    reaches the driver, which locates each key's target bucket and
    in-bucket rank (vectorized, one searchsorted per key) and
    broadcasts the (key -> bucket, rank) map.  Pass 2: a filtered
    (key, value) count combiner over ONLY the target buckets, then a
    coarse key partition picks each key's order statistic locally —
    the driver never sees value-level rows.  Rank convention
    ``ceil(q*n)-1`` matches DuckDB ``quantile_disc`` (same probes as
    the global variant).
    """
    import math

    from .dedup import _coarse_group_apply

    # two passes consume ds (histogram, then in-bucket counts) — pin it
    # so the upstream read/prep doesn't execute twice (repo convention
    # for any dataset with two consumers)
    ds = ds.materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["_b"] = df[val_col].to_numpy(dtype=np.int64) >> shift
        g = df.groupby([key_col, "_b"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "cnt"}), preserve_index=False
        )

    from .dedup import driver_merge_sum

    hist = (
        driver_merge_sum(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            [key_col, "_b"],
            ["cnt"],
        )
        .sort_values([key_col, "_b"])
        .reset_index(drop=True)
    )
    # per-key target bucket + in-bucket rank, vectorized over the
    # aggregate histogram
    targets: dict = {}
    for key, grp in hist.groupby(key_col, sort=False):
        c = grp["cnt"].to_numpy(dtype=np.int64)
        b = grp["_b"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        rank = max(math.ceil(q * n) - 1, 0)
        cum = np.cumsum(c)
        bi = int(np.searchsorted(cum, rank + 1))
        targets[key] = (
            int(b[bi]),
            rank - (int(cum[bi - 1]) if bi > 0 else 0),
        )
    t_ref = ray.put(targets)

    def in_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd

        tg = ray.get(t_ref)
        df = batch.to_pandas()
        bmap = {k: v[0] for k, v in tg.items()}
        tb = df[key_col].map(bmap).to_numpy(dtype=np.int64)
        v = df[val_col].to_numpy(dtype=np.int64)
        keep = (v >> shift) == tb
        g = (
            df[keep]
            .assign(_v=v[keep])
            .groupby([key_col, "_v"], as_index=False)
            .size()
        )
        return pa.Table.from_pandas(
            g.rename(columns={"size": "cnt"}), preserve_index=False
        )

    def tag_key_hash(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        from .dedup import _hash64

        return batch.append_column(
            "_kh",
            pa.array([_hash64(str(k)) for k in keys], pa.uint64()),
        )

    def pick(part: pa.Table) -> pa.Table:
        # one key-hash partition holds every (key, _v) partial of its
        # keys: merge the per-batch combiner rows here (ONE shuffle
        # total — the old separate groupby().sum() round is fused away)
        tg = ray.get(t_ref)
        df = (
            part.to_pandas()
            .groupby([key_col, "_v"], as_index=False)["cnt"]
            .sum()
            .sort_values([key_col, "_v"])
        )
        out_k, out_v = [], []
        for key, grp in df.groupby(key_col, sort=False):
            rank_in = tg[key][1]
            cum = grp["cnt"].to_numpy(dtype=np.int64).cumsum()
            i = int(np.searchsorted(cum, rank_in + 1))
            out_k.append(key)
            out_v.append(int(grp["_v"].to_numpy(dtype=np.int64)[i]))
        return pa.table(
            {
                key_col: pa.array(out_k),
                "q_value": pa.array(out_v, pa.int64()),
            }
        )

    return _coarse_group_apply(
        ds.map_batches(in_bucket, batch_format="pyarrow").map_batches(
            tag_key_hash, batch_format="pyarrow"
        ),
        "_kh",
        lambda g: pick(g),
        num_parts,
    )


def exact_group_weighted_median(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str = "cents",
    weight_col: str = "wt",
    shift: int = 16,
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """EXACT per-group WEIGHTED (lower) median via weighted histogram
    descent: the smallest value v whose cumulative weight over values
    <= v reaches half the group's total weight (2*cum >= W, i.e. the
    integer target t = (W+1)//2).

    Same two-pass scale shape as ``exact_group_quantile_descent`` with
    counts generalized to int64 weight sums: pass 1 ships one
    (key, coarse-bucket, weight-sum) row per batch-cell; the driver
    holds only the merged histogram and broadcasts each key's
    (bucket, in-bucket weight target); pass 2 sums weights per
    distinct value inside target buckets only, and a coarse key
    partition picks each median locally.  No group ever materializes
    in one worker and no raw row reaches the driver.
    """
    from .dedup import _coarse_group_apply

    # two passes consume ds — pin it so the upstream read/prep doesn't
    # execute twice
    ds = ds.materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["_b"] = df[val_col].to_numpy(dtype=np.int64) >> shift
        g = df.groupby([key_col, "_b"], as_index=False)[weight_col].sum()
        return pa.Table.from_pandas(
            g.rename(columns={weight_col: "w"}), preserve_index=False
        )

    from .dedup import driver_merge_sum

    hist = (
        driver_merge_sum(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            [key_col, "_b"],
            ["w"],
        )
        .sort_values([key_col, "_b"])
        .reset_index(drop=True)
    )
    targets: dict = {}
    for key, grp in hist.groupby(key_col, sort=False):
        w = grp["w"].to_numpy(dtype=np.int64)
        b = grp["_b"].to_numpy(dtype=np.int64)
        t = (int(w.sum()) + 1) // 2
        cum = np.cumsum(w)
        bi = int(np.searchsorted(cum, t, side="left"))
        targets[key] = (
            int(b[bi]),
            t - (int(cum[bi - 1]) if bi > 0 else 0),
        )
    t_ref = ray.put(targets)

    def in_bucket(batch: pa.Table) -> pa.Table:
        tg = ray.get(t_ref)
        df = batch.to_pandas()
        bmap = {k: v[0] for k, v in tg.items()}
        tb = df[key_col].map(bmap).to_numpy(dtype=np.int64)
        v = df[val_col].to_numpy(dtype=np.int64)
        keep = (v >> shift) == tb
        g = (
            df[keep]
            .assign(_v=v[keep])
            .groupby([key_col, "_v"], as_index=False)[weight_col]
            .sum()
        )
        return pa.Table.from_pandas(
            g.rename(columns={weight_col: "w"}), preserve_index=False
        )

    def tag_key_hash(batch: pa.Table) -> pa.Table:
        from .dedup import _hash64

        keys = batch[key_col].to_pylist()
        return batch.append_column(
            "_kh",
            pa.array([_hash64(str(k)) for k in keys], pa.uint64()),
        )

    def pick(part: pa.Table) -> pa.Table:
        # merge the per-batch (key, _v, w) combiner rows inside the one
        # key-hash partition (the old groupby().sum() round is fused)
        tg = ray.get(t_ref)
        df = (
            part.to_pandas()
            .groupby([key_col, "_v"], as_index=False)["w"]
            .sum()
            .sort_values([key_col, "_v"])
        )
        out_k, out_v = [], []
        for key, grp in df.groupby(key_col, sort=False):
            t_in = tg[key][1]
            cum = grp["w"].to_numpy(dtype=np.int64).cumsum()
            i = int(np.searchsorted(cum, t_in, side="left"))
            out_k.append(key)
            out_v.append(int(grp["_v"].to_numpy(dtype=np.int64)[i]))
        return pa.table(
            {
                key_col: pa.array(out_k),
                "wmedian": pa.array(out_v, pa.int64()),
            }
        )

    return _coarse_group_apply(
        ds.map_batches(in_bucket, batch_format="pyarrow").map_batches(
            tag_key_hash, batch_format="pyarrow"
        ),
        "_kh",
        lambda g: pick(g),
        num_parts,
    )


# --------------------------------------------------------------- KMV
def _bottom_k_partials(
    ds: "ray.data.Dataset", col: str, k: int, num_parts: int = 64
) -> np.ndarray:
    """Global k smallest DISTINCT ``_id_hash`` values of ``ds[col]``.

    Exactness argument: the global bottom-k is contained in the union
    of per-batch bottom-k's, so batch-level truncation then
    partition-level truncation then a driver merge of ``num_parts``
    k-sets loses nothing.  Driver state is <= num_parts * k ints.
    """
    from .dedup import _coarse_group_apply

    def batch_bk(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        # keep the hash in the nonneg 63-bit domain: bottom-k only
        # needs a consistent total order, and a nonneg key feeds the
        # coarse partitioner's uint cast directly
        h = np.unique(_id_hash(v) >> np.uint64(1)).astype(np.int64)
        return pa.table({"h": pa.array(h[:k], pa.int64())})

    def part_bk(part: pa.Table) -> pa.Table:
        h = np.unique(part["h"].to_numpy(zero_copy_only=False))
        return pa.table({"h": pa.array(h[:k], pa.int64())})

    parts = _coarse_group_apply(
        ds.map_batches(batch_bk, batch_format="pyarrow"),
        "h",
        part_bk,
        num_parts,
    ).to_pandas()
    h = np.unique(parts["h"].to_numpy())
    return h[:k]


def kmv_jaccard(
    ds_a: "ray.data.Dataset",
    ds_b: "ray.data.Dataset",
    col: str,
    k: int = 65536,
) -> dict:
    """KMV (k-minimum-values, Bar-Yossef et al. 2002) set-similarity
    sketch between two keyed Datasets: distinct counts, intersection,
    union and Jaccard estimated from the k smallest hash values per
    side.  When neither sketch saturates (fewer than k distinct keys a
    side) the sketch holds EVERY hash and all four numbers are exact —
    the same exact-regime oracle pattern as the HLL and bottom-k
    quantile guards.  Saturated regime: standard KMV estimators on the
    union sketch.  Driver state is two k-vectors.
    """
    a = _bottom_k_partials(ds_a, col, k)
    b = _bottom_k_partials(ds_b, col, k)
    exact = a.size < k and b.size < k
    if exact:
        n_inter = np.intersect1d(a, b, assume_unique=True).size
        n_union = np.union1d(a, b).size
        return {
            "n_a": int(a.size),
            "n_b": int(b.size),
            "n_inter": int(n_inter),
            "n_union": int(n_union),
            "exact": True,
        }
    u = np.union1d(a, b)[:k]
    kth = u[-1]
    in_both = np.intersect1d(a, b, assume_unique=True)
    n_inter_sk = int((in_both <= kth).sum())
    # standard KMV cardinality estimate: (k - 1) / normalized kth
    # value (hashes live in the nonneg 63-bit domain)
    denom = float(kth) / 2**63
    n_union_est = int(round((k - 1) / max(denom, 1e-12)))
    j_est = n_inter_sk / k
    return {
        "n_a": int(min(a.size, k)),
        "n_b": int(min(b.size, k)),
        "n_inter": int(round(j_est * n_union_est)),
        "n_union": n_union_est,
        "exact": False,
    }


# ------------------------------------------------------- count-min sketch
class CountMin:
    """Count-min sketch (Cormode & Muthukrishnan 2005): ``depth``
    rows of ``width`` counters; point queries return the row-wise
    minimum, an OVERESTIMATE of the true count by at most eN/width
    w.h.p. — the dual of the Misra-Gries underestimate above.  Merge
    is element-wise sum (trivially associative), so per-batch partials
    combine in any order and any tree shape."""

    def __init__(self, width: int = 4096, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column positions from one 64-bit base hash per
        item: splitmix remix with a per-row constant (independent-ish
        row hash functions from a single stored hash)."""
        h = np.asarray(hashes, dtype=np.uint64)
        out = np.empty((self.depth, len(h)), dtype=np.int64)
        for d in range(self.depth):
            out[d] = (
                _id_hash(h + np.uint64(0xA5A5A5A5 * (d + 1)))
                % np.uint64(self.width)
            ).astype(np.int64)
        return out

    def add_hashes(self, hashes: np.ndarray) -> "CountMin":
        pos = self._positions(hashes)
        for d in range(self.depth):
            self.table[d] += np.bincount(
                pos[d], minlength=self.width
            ).astype(np.int64)
        return self

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        ests = np.stack(
            [self.table[d][pos[d]] for d in range(self.depth)]
        )
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        return self


def _str_hash64(values) -> np.ndarray:
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    str(v).encode("utf-8"), digest_size=8
                ).digest(),
                "big",
            )
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def count_min_counts(
    ds: "ray.data.Dataset",
    col: str,
    query_keys: list,
    width: int = 4096,
    depth: int = 4,
) -> pa.Table:
    """Point-query counts for ``query_keys`` from a count-min sketch
    built in one ``map_batches`` pass: each batch emits ONE dense
    (depth x width) partial (same shape as the HLL register partials),
    the driver sum-merges them — constant-size state, no shuffle.

    Exact regime: when the column's distinct values are a small FIXED
    domain (e.g. event types) whose pairwise positions don't fully
    collide — a data-independent property of the hash — the minimum
    row is collision-free and estimates are exactly the true counts;
    that regime is this sketch's SQL-oracle guard.  Otherwise the
    estimate is a guaranteed overestimate (pytest-anchored).
    """

    def partial(batch: pa.Table) -> pa.Table:
        cm = CountMin(width, depth)
        vals = batch[col].to_pylist()
        if vals:
            cm.add_hashes(_str_hash64(vals))
        return pa.table(
            {"tbl": pa.array([cm.table.tobytes()], pa.binary())}
        )

    merged = CountMin(width, depth)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        other = CountMin(width, depth)
        other.table = np.frombuffer(row["tbl"], dtype=np.int64).reshape(
            depth, width
        ).copy()
        merged = merged.merge(other)
    keys = [str(k) for k in query_keys]
    est = merged.estimate_hashes(_str_hash64(keys))
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "est_n": pa.array(est.astype(np.int64), pa.int64()),
        }
    )
