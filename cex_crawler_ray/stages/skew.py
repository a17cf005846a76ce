"""Skew-aware aggregation patterns.

Combiner-style partial aggregation (used throughout this repo) already
neutralizes hot keys for SUM/COUNT-shaped aggregates — every batch
emits one row per key regardless of how many rows the key has.  The
aggregate that genuinely needs SALTING is per-key COUNT(DISTINCT):
a naive groupby(key) ships every (key, value) pair of the hot key to
one reducer.

``salted_group_distinct`` salts by VALUE hash: stage 1 groups on
(key, hash(value) % salts) — all copies of the same value share a salt,
so a per-(key, salt) local distinct count is exact and a hot key's
distinct work spreads over ``salts`` reducers; stage 2 sums the ≤
``salts`` partial counts per key.  Both exchanges carry counter rows,
never raw values of the hot key concentrated on one task.

This is the general recipe: salt by a function of the DEDUP UNIT
(here the value), aggregate locally, re-aggregate the salt partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def salted_group_distinct(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    salts: int = 16,
) -> "ray.data.Dataset":
    """Exact per-key COUNT(DISTINCT val) with value-hash salting.

    Returns (key, n_distinct) — one row per key.
    """

    # stage 1 emits batch-deduped (key, salt, value) rows — local
    # counts can't simply be summed across batches (the same value may
    # appear in many batches), so the distinct VALUES travel, spread
    # over the salt space; the hot key's rows land on ``salts``
    # different reducers instead of one
    def partial_vals(df: "pd.DataFrame") -> "pd.DataFrame":
        v = df[val_col].to_numpy()
        salt = (
            pd.util.hash_array(np.asarray(v)) % np.uint64(salts)
        ).astype(np.int64)
        return pd.DataFrame(
            {key_col: df[key_col], "_salt": salt, val_col: v}
        ).drop_duplicates()

    stage1 = ds.map_batches(partial_vals, batch_format="pandas")

    def count_distinct(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        out = df.groupby(key_col, as_index=False)[val_col].nunique()
        out = out.rename(columns={val_col: "nd"})
        return pa.Table.from_pandas(out, preserve_index=False)

    # co-partition on (key, salt) via a combined coarse hash; each
    # (key, salt) cell is fully contained in one partition, so the
    # local nunique per key is an exact per-salt partial
    from .dedup import _coarse_group_apply

    def add_cell(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_pandas()
        s = batch["_salt"].to_numpy(zero_copy_only=False)
        cell = (
            pd.util.hash_array(k.to_numpy()).astype(np.uint64)
            * np.uint64(1_000_003)
            + s.astype(np.uint64)
        )
        return batch.append_column(
            "_cell", pa.array(cell, pa.uint64())
        )

    partials = _coarse_group_apply(
        stage1.map_batches(add_cell, batch_format="pyarrow"),
        "_cell",
        count_distinct,
    )

    merged = partials.groupby(key_col).sum("nd")

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.rename_columns([key_col, "n_distinct"])
        return pa.table(
            {
                key_col: t[key_col],
                "n_distinct": t["n_distinct"]
                .combine_chunks()
                .cast(pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    hot_k: int = 32,
    num_parts: int = 64,
    checkpoint_left: bool = True,
) -> "ray.data.Dataset":
    """Skew-aware inner hash join on non-negative int64 keys.

    The classic hot-key fix for shuffle joins: a plain co-partition
    join sends EVERY row of a hot key to one reducer.  Here a
    Misra-Gries pass over the left keys nominates up to ``hot_k``
    candidates; the right-side rows for those keys (dimension-sized by
    assumption: <= hot_k keys x right rows per key) are broadcast once
    via ``ray.put`` and the left's hot rows join per batch with NO
    shuffle, while cold rows take the normal co-partition path.

    The MG candidate set varies with batch boundaries — that is a
    ROUTING decision only: both paths compute the same inner join, so
    the output row set is identical to ``hash_join`` regardless of
    which keys go hot (and therefore oracles exactly).

    ``checkpoint_left=True`` (default) materializes the left once
    because it is consumed by both the MG pass and the join pass.
    """
    from .join import hash_join
    from .sketch import mg_heavy_hitters

    if checkpoint_left:
        left = left.materialize()

    mg_tbl, _, _ = mg_heavy_hitters(left, left_key, k=hot_k)
    hot_keys = np.sort(
        mg_tbl["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    if hot_keys.size == 0:
        return hash_join(
            left, right, left_key, right_key, num_parts=num_parts
        )

    def split_right(want_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            k = (
                batch[right_key]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = np.isin(k, hot_keys)
            return batch.filter(pa.array(m if want_hot else ~m))

        return fn

    # dimension-sized by contract: <= hot_k keys' worth of right rows
    hot_right_df = (
        right.map_batches(split_right(True), batch_format="pyarrow")
        .to_pandas()
    )
    if hot_right_df.shape[1] == 0:
        # an all-filtered hot side loses its schema in to_pandas;
        # rebuild the empty frame so the per-batch merge keeps columns
        rs = right.schema()
        hot_right_df = pa.schema(
            list(zip(rs.names, rs.types))
        ).empty_table().to_pandas()
    hot_right_ref = ray.put(hot_right_df)

    def hot_join(df: "pd.DataFrame") -> "pd.DataFrame":
        k = df[left_key].to_numpy().astype(np.int64)
        sub = df[np.isin(k, hot_keys)]
        rp = ray.get(hot_right_ref)
        return sub.merge(
            rp, left_on=left_key, right_on=right_key, how="inner"
        )

    def cold_left(batch: pa.Table) -> pa.Table:
        k = (
            batch[left_key]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return batch.filter(pa.array(~np.isin(k, hot_keys)))

    hot_out = left.map_batches(hot_join, batch_format="pandas")
    cold_out = hash_join(
        left.map_batches(cold_left, batch_format="pyarrow"),
        right.map_batches(split_right(False), batch_format="pyarrow"),
        left_key,
        right_key,
        num_parts=num_parts,
    )
    return hot_out.union(cold_out)
