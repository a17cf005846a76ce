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
