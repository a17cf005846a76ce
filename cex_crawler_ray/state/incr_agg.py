"""Incremental aggregate maintenance (materialized-view update).

The dedup analog already exists (`dedup.minhash_lsh_pairs_incremental`
persists the band index); this is the AGGREGATE analog: a persisted
(key, n, sum) table that a new micro-batch of rows merges into without
touching historical raw data — the cron-driven "update the running
report" pattern of the reference's scheduler (reference run.sh:5-6),
re-expressed as state + combiner instead of a re-crawl.

Scale shape: the new batch collapses to one row per (block, key)
inside map_batches, the union with the previous state shuffles only
aggregate rows (state size = |keys|, never |history rows|), and the
new generation is written BEFORE the manifest flips — crash-safe the
same way the crawl checkpoint is (stale generations are GC'd on the
next successful update).
"""

from __future__ import annotations

import json
import os

import pandas as pd

import ray

_MANIFEST = "manifest.json"


def _read_manifest(state_dir: str) -> dict | None:
    p = os.path.join(state_dir, _MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def update_group_sums(
    state_dir: str,
    new_ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
) -> "ray.data.Dataset":
    """Merge ``new_ds`` rows into the persisted per-key (n, sum) state;
    returns the NEW state as a Dataset of (key, n, sum_val) rows."""
    os.makedirs(state_dir, exist_ok=True)
    man = _read_manifest(state_dir)
    gen = (man["gen"] + 1) if man else 0

    def partial(df: "pd.DataFrame"):
        import pyarrow as pa

        g = pd.DataFrame(
            {key_col: df[key_col], "_v": df[val_col]}
        ).groupby(key_col, as_index=False)
        out = g.agg(n=("_v", "size"), sum_val=("_v", "sum"))
        # arrow block: the union below mixes in the parquet-read state,
        # and ray groupby requires homogeneous block types
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = new_ds.map_batches(partial, batch_format="pandas")
    if man:
        prev = ray.data.read_parquet(
            os.path.join(state_dir, man["path"])
        )
        parts = parts.union(prev)

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "n": [int(df["n"].sum())],
                "sum_val": [int(df["sum_val"].sum())],
            }
        )

    merged = parts.groupby(key_col).map_groups(
        final, batch_format="pandas"
    )
    out_rel = f"gen-{gen}"
    out_dir = os.path.join(state_dir, out_rel)
    merged.write_parquet(out_dir)

    tmp = os.path.join(state_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"gen": gen, "path": out_rel}, f)
    os.replace(tmp, os.path.join(state_dir, _MANIFEST))
    # GC superseded generations now that the manifest points past them
    for name in os.listdir(state_dir):
        if name.startswith("gen-") and name != out_rel:
            import shutil

            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    return ray.data.read_parquet(out_dir)
