"""Distributed joins + session windows.

The reference has NO dataset-to-dataset joins (SURVEY.md §2.6 "absent"),
but a complete engine needs them; two regimes:

* broadcast join — small side `ray.put` once, probed inside
  `map_batches` (used by `__ray_entry__.q_broadcast_join_agg`),
* shuffle hash join (here) — both sides partitioned by `hash(key) % P`,
  co-grouped, joined vectorized per partition.  One all-to-all over the
  join columns only; P bounds per-task memory (size it so the larger
  side's partition fits a worker).

Plus `sessionize`: gap-based session windows over an event stream —
the classic streaming/windowed aggregate the reference's cron-batch
model lacks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    num_parts: int = 64,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Partitioned hash join of two Datasets on integer keys.

    Both sides are tagged, union-ed, shuffled once on
    ``hash(key) % num_parts``, and each partition runs a local pandas
    merge — the textbook co-partition join expressed with Ray Data
    groupby (no driver materialization of either side).
    """

    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    overlap = (set(lcols) & set(rcols)) - {left_key, right_key}
    assert not overlap, f"ambiguous columns: {overlap}"
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    all_cols = lcols + [c for c in rcols if c not in lcols]
    all_types = {**rtypes, **ltypes}

    def tag(side: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            k = (
                batch[key]
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64, copy=False)
            )
            part = pa.array(
                ((k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_parts)).astype(
                    np.int64
                ),
                pa.int64(),
            )
            # pad to the unified schema so both sides union cleanly
            arrays = []
            for c in all_cols:
                if c in batch.column_names:
                    arrays.append(batch[c].combine_chunks())
                else:
                    arrays.append(pa.nulls(n, all_types[c]))
            out = pa.Table.from_arrays(arrays, names=all_cols)
            return out.append_column("__part", part).append_column(
                "__side", pa.array([side] * n, pa.string())
            )

        return fn

    tagged = left.map_batches(
        tag("l", left_key), batch_format="pyarrow"
    ).union(right.map_batches(tag("r", right_key), batch_format="pyarrow"))

    # union-padding with pa.nulls makes the other side's int columns
    # float64 in pandas; restore int64 after side-filtering (the padding
    # nulls are gone by then, so the cast is exact)
    int_l = {c: "int64" for c in lcols if pa.types.is_integer(ltypes[c])}
    int_r = {c: "int64" for c in rcols if pa.types.is_integer(rtypes[c])}

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        lp = df[df["__side"] == "l"][lcols].astype(int_l)
        rp = df[df["__side"] == "r"][rcols].astype(int_r)
        return lp.merge(rp, left_on=left_key, right_on=right_key, how=how)

    return tagged.groupby("__part").map_groups(
        join_part, batch_format="pandas"
    )


def sessionize(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> "ray.data.Dataset":
    """Gap-based session windows: within each user's event stream
    (ordered by ts, id), a new session starts when the gap from the
    previous event exceeds ``gap_minutes``.  Returns
    (event_id, session_id) with session ids numbered from 0 per user.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col])
        new_session = (df[ts_col].diff() > gap).fillna(False)
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "session_id": new_session.cumsum().astype("int64"),
            }
        )

    return events.groupby(user_col).map_groups(sess, batch_format="pandas")
