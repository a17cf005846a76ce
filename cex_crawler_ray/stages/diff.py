r"""Keyed table diff: compare two snapshots of the same logical table.

The reference recrawls the same exchange catalogs on a cron loop
(reference ``run.sh`` rerun model) and decides what changed only via
its seen-URL set.  A data-engine version needs the real operator: given
snapshot A (old) and snapshot B (new) keyed by an int64 key, emit one
row per differing key with status ``added`` (only in B), ``removed``
(only in A) or ``changed`` (in both, value differs).  Unchanged keys
are dropped, so output size is bounded by the churn, not the table.

Distribution: tag each side, union, ONE hash shuffle on the key; a
key's (≤2) rows land in the same partition, where the compare is a
vectorized pandas pivot.  No driver materialization, no broadcast —
both snapshots stream.  At 100 TB this is the standard CDC shape:
the shuffle carries (key, value) pairs only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .dedup import _coarse_group_apply

# sentinel for "no value on this side" in the int64 output columns
NO_VALUE = -1


def table_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Diff two keyed snapshots on one int64 value column.

    Each input must be unique per ``key_col`` (duplicate keys within a
    side make 'the value' ambiguous — pre-aggregate first).  Returns
    ``(key, status, old_val, new_val)`` with ``NO_VALUE`` (-1) standing
    in for the absent side.
    """
    import pandas as pd

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: batch[key_col].cast(pa.int64()),
                    "_val": batch[val_col].cast(pa.int64()),
                    "_side": pa.array(
                        np.full(batch.num_rows, side, np.int64)
                    ),
                }
            )

        return fn

    both = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )

    def compare(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        if len(df) == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "status": pa.array([], pa.string()),
                    "old_val": pa.array([], pa.int64()),
                    "new_val": pa.array([], pa.int64()),
                }
            )
        wide = df.pivot_table(
            index=key_col, columns="_side", values="_val", aggfunc="first"
        ).reindex(columns=[0, 1])
        o = wide[0]
        n = wide[1]
        status = np.where(
            o.isna(),
            "added",
            np.where(n.isna(), "removed", "changed"),
        )
        keep = o.isna() | n.isna() | (o != n)
        out = pd.DataFrame(
            {
                key_col: wide.index.to_numpy(dtype=np.int64),
                "status": status,
                "old_val": o.fillna(NO_VALUE).astype("int64").to_numpy(),
                "new_val": n.fillna(NO_VALUE).astype("int64").to_numpy(),
            }
        )[keep.to_numpy()]
        return pa.Table.from_pandas(out, preserve_index=False)

    return _coarse_group_apply(both, key_col, compare, num_parts)


def merge_apply(
    base: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    op_col: str = "op",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """MERGE INTO semantics — apply a keyed change set to a snapshot:
    ``op='U'`` rows upsert (update when the key exists, insert when it
    does not), ``op='D'`` rows delete; unmatched base rows pass through.
    The apply-side twin of ``table_diff`` (which produces such change
    sets): ``merge_apply(old, table_diff(old, new) -> ops) == new``.

    Both inputs must be unique per ``key_col``.  Shape: tag + union +
    ONE coarse key shuffle; each partition resolves vectorized (a
    change-key probe filters the base side, then 'U' rows append).
    Output is ``(key, val)`` — the merged snapshot; at 100 TB this is
    the nightly snapshot-maintenance operator, output bounded by
    |base| + |inserts|.
    """
    import pandas as pd

    def tag_base(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col].cast(pa.int64()),
                "_val": batch[val_col].cast(pa.int64()),
                "_op": pa.array([""] * batch.num_rows, pa.string()),
                "_side": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    def tag_change(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col].cast(pa.int64()),
                "_val": batch[val_col].cast(pa.int64()),
                "_op": batch[op_col].cast(pa.string()),
                "_side": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    both = base.map_batches(tag_base, batch_format="pyarrow").union(
        changes.map_batches(tag_change, batch_format="pyarrow")
    )

    def resolve(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        ch = df[df["_side"] == 1]
        keep = df[
            (df["_side"] == 0) & ~df[key_col].isin(ch[key_col])
        ]
        ups = ch[ch["_op"] == "U"]
        out = pd.concat([keep, ups], ignore_index=True)
        return pa.table(
            {
                key_col: pa.array(
                    out[key_col].to_numpy(np.int64), pa.int64()
                ),
                val_col: pa.array(
                    out["_val"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    return _coarse_group_apply(both, key_col, resolve, num_parts)
