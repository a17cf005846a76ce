"""N-stream co-group on a shared key in ONE exchange.

The classic multi-way-join scale pattern: when several tables join /
aggregate on the SAME key, shipping each through its own groupby and
then joining the results pays one all-to-all per table plus one per
join.  Co-grouping tags every stream with a side index, pads all of
them to one union schema, unions, and hash-partitions ONCE on the key
— each partition then holds every side's complete rows for its keys,
so an arbitrary multi-stream combine (aggregates, joins, correlated
filters like "events after the customer's first order") runs locally
and exactly, per partition, with no further exchange.

Reference parity: the reference's report stage unions per-exchange
outputs and re-groups them several times (reference main.py post-crawl
consolidation); this operator is the one-exchange generalization.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def cogroup_apply(
    datasets: Sequence["ray.data.Dataset"],
    key_cols: Sequence[str],
    fn: Callable[[list["pd.DataFrame"]], "pa.Table"],
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Co-group ``datasets`` on their per-side int64 key columns.

    ``fn`` receives one pandas DataFrame per side — original column
    names, the side's own key column included — holding every row of
    that side whose key lands in the partition, and returns a
    ``pa.Table`` (or DataFrame) of per-key results.  Keys are
    co-located by low-bits hash partitioning (``num_parts`` a power of
    two), so ``fn``'s view of any key it sees is COMPLETE across all
    sides.

    Scale shape: one union + one all-to-all regardless of the number
    of sides; the exchange carries each side's projected rows exactly
    once.  Column names are prefixed per side internally so identical
    names across sides never collide in the union schema.
    """
    assert len(datasets) == len(key_cols) and len(datasets) >= 2
    n_sides = len(datasets)
    mask = np.int64(num_parts - 1)

    # explicit null padding to ONE union schema: Ray's union does not
    # align heterogeneous block schemas, so every side emits every
    # prefixed column (its own populated, the others null) — same
    # pattern as join.hash_join
    side_fields: list[list[tuple[str, pa.DataType]]] = [
        [
            (f"s{i}_{name}", typ)
            for name, typ in zip(ds.schema().names, ds.schema().types)
        ]
        for i, ds in enumerate(datasets)
    ]
    all_fields = [f for fields in side_fields for f in fields]

    sides = []
    for i, (ds, kc) in enumerate(zip(datasets, key_cols)):
        own = {name for name, _ in side_fields[i]}

        def tag(batch: pa.Table, i=i, kc=kc, own=own) -> pa.Table:
            n = batch.num_rows
            k = batch[kc].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "_part": pa.array(k & mask, pa.int64()),
                "_side": pa.array(
                    np.full(n, i, dtype=np.int64), pa.int64()
                ),
            }
            for name, typ in all_fields:
                if name in own:
                    cols[name] = batch[name.split("_", 1)[1]]
                else:
                    cols[name] = pa.nulls(n, typ)
            return pa.table(cols)

        sides.append(ds.map_batches(tag, batch_format="pyarrow"))

    u = sides[0]
    for s in sides[1:]:
        u = u.union(s)

    def run(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        frames: list[pd.DataFrame] = []
        for i in range(n_sides):
            pref = f"s{i}_"
            cols = [c for c in df.columns if c.startswith(pref)]
            sub = df.loc[df["_side"] == i, cols].rename(
                columns={c: c[len(pref):] for c in cols}
            )
            frames.append(sub.reset_index(drop=True))
        out = fn(frames)
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        return out

    return (
        u.groupby("_part")
        .map_groups(
            lambda g: run(g.drop_columns(["_part"])),
            batch_format="pyarrow",
        )
    )
