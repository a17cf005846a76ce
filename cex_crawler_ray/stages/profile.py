"""Table profiling: one streaming pass of per-column statistics.

The data-engineering "describe" every warehouse ships: per column
n_rows / n_nulls / exact n_distinct / min / max.  Two exchanges, both
bounded:

* stats pass — each batch reduces to ONE partial row per column
  (counts + typed min/max), so the groupby shuffle carries
  blocks x n_cols rows;
* distinct pass — per-batch-deduped (column, value) pairs co-partition
  on hash(column, value); each partition counts its exact share and
  the final sum is n_cols rows.  The exchange is bounded by the
  DISTINCT value count, never the row count (same contract as the
  exact-distinct operator).

Min/max compare in the column's native type (int64 numerically,
strings lexicographically) and stringify only in the final row, so the
output schema is uniform across column types and matches a
``CAST(MIN(col) AS VARCHAR)`` SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def profile_table(
    ds: "ray.data.Dataset",
    columns: list[str],
) -> pd.DataFrame:
    """Profile int64/string columns; returns a tiny DataFrame with one
    row per column: (col_name, n_rows, n_nulls, n_distinct, min_val,
    max_val) — min/max as strings over non-null values only."""

    schema = ds.schema()
    kinds = {}
    for name, typ in zip(schema.names, schema.types):
        if name not in columns:
            continue
        if isinstance(typ, pa.DataType):
            kinds[name] = "int" if pa.types.is_integer(typ) else "str"
        else:  # pandas-block schema: numpy / extension dtype
            kinds[name] = "int" if "int" in str(typ).lower() else "str"
    missing = set(columns) - set(kinds)
    assert not missing, f"unknown columns: {missing}"

    def stat_partial(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for col in columns:
            arr = batch[col]
            n = len(arr)
            nulls = arr.null_count
            valid = arr.drop_null()
            if kinds[col] == "int":
                v = valid.to_numpy(zero_copy_only=False)
                mn = int(v.min()) if len(v) else None
                mx = int(v.max()) if len(v) else None
                rows.append((col, n, nulls, mn, mx, None, None))
            else:
                v = valid.to_pandas()
                mn = v.min() if len(v) else None
                mx = v.max() if len(v) else None
                rows.append((col, n, nulls, None, None, mn, mx))
        return pd.DataFrame(
            rows,
            columns=[
                "col_name",
                "n_rows",
                "n_nulls",
                "min_i",
                "max_i",
                "min_s",
                "max_s",
            ],
        )

    def stat_final(df: pd.DataFrame) -> pd.DataFrame:
        col = df["col_name"].iloc[0]
        if kinds[col] == "int":
            mn_col, mx_col = df["min_i"].dropna(), df["max_i"].dropna()
            mn = str(int(mn_col.min())) if len(mn_col) else None
            mx = str(int(mx_col.max())) if len(mx_col) else None
        else:
            mn_col, mx_col = df["min_s"].dropna(), df["max_s"].dropna()
            mn = str(mn_col.min()) if len(mn_col) else None
            mx = str(mx_col.max()) if len(mx_col) else None
        return pd.DataFrame(
            {
                "col_name": [col],
                "n_rows": [int(df["n_rows"].sum())],
                "n_nulls": [int(df["n_nulls"].sum())],
                "min_val": [mn],
                "max_val": [mx],
            }
        )

    # checkpoint once: the stats pass and the distinct pass both
    # consume ``ds``; without this the upstream chain executes twice
    ds = ds.materialize()

    # the per-batch stat partials (one row per column per batch,
    # integer/string min-max — order-free) are driver-bound: merge on
    # the driver instead of paying a shuffle round
    parts = pa.concat_tables(
        ray.get(
            ds.map_batches(
                stat_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ),
        promote_options="default",
    ).to_pandas()
    stats = pd.concat(
        [stat_final(g) for _, g in parts.groupby("col_name", sort=True)],
        ignore_index=True,
    )

    # ---------------- exact distinct per column (value-bounded) ------
    def distinct_partial(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        for col in columns:
            v = batch[col].drop_null()
            if kinds[col] == "int":
                u = np.unique(v.to_numpy(zero_copy_only=False))
                sv = u.astype(str)
            else:
                sv = v.to_pandas().unique().astype(str)
            cols.extend([col] * len(sv))
            vals.extend(sv.tolist())
        t = pa.table(
            {
                "col_name": pa.array(cols, pa.string()),
                "val": pa.array(vals, pa.string()),
            }
        )
        if len(cols):
            cell = (
                pd.util.hash_array(np.asarray(cols, dtype=object))
                ^ pd.util.hash_array(np.asarray(vals, dtype=object))
            ).astype(np.uint64)
        else:
            cell = np.zeros(0, dtype=np.uint64)
        return t.append_column("_cell", pa.array(cell, pa.uint64()))

    def count_partition(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates(["col_name", "val"])
        out = df.groupby("col_name", as_index=False).size()
        return pa.Table.from_pandas(
            out.rename(columns={"size": "nd"}), preserve_index=False
        )

    from .dedup import _coarse_group_apply

    from .dedup import driver_merge_sum

    # per-partition distinct counts (<= columns x partitions int rows)
    # are driver-bound — merge on the driver
    nd = driver_merge_sum(
        _coarse_group_apply(
            ds.map_batches(distinct_partial, batch_format="pyarrow"),
            "_cell",
            count_partition,
        ),
        ["col_name"],
        ["nd"],
    ).rename(columns={"nd": "n_distinct"})
    nd["n_distinct"] = nd["n_distinct"].astype("int64")

    out = stats.merge(nd, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out[
        ["col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"]
    ]
    return out.sort_values("col_name").reset_index(drop=True)
