r"""Sequence-packing index: map every document to its global token
offset and training-example id.

A dataloader that packs documents into fixed-length training sequences
(example k = tokens [k*seq_len, (k+1)*seq_len)) needs, per document,
the global starting offset in the concatenated token stream ordered by
doc_id.  This is a GLOBAL ordered cumulative sum — the classic
two-pass distributed prefix-sum:

1. pass 1 (combiner): per-batch token sums per COARSE bucket
   (``doc_id // bucket``); the groupby shuffle carries one row per
   (batch, bucket) and only the merged per-bucket totals (one row per
   bucket — 10^10 docs / 2^20 bucket ≈ 10^4 rows) reach the driver,
   which prefix-sums them into bucket offsets.
2. pass 2: ``groupby(bucket).map_groups`` — within-bucket cumsum
   (sorted by doc_id) plus the broadcast bucket offset.

No stage ever materializes per-document state on the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray

_NONWS_RE = re.compile(r"\S+")


def pack_index(
    ds: "ray.data.Dataset",
    seq_len: int = 256,
    bucket: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_input: bool = True,
) -> "ray.data.Dataset":
    """(id, n_tokens, start_offset, example_id) with whitespace token
    counts, offsets in doc_id order, example_id = offset // seq_len.

    The input is consumed TWICE (bucket token-count pass + the offset
    emit pass), so by default it is checkpointed once up front — same
    rationale as ``strip_dup_spans``: Ray Data re-runs a lazy graph
    per consumer, which re-executes a long upstream chain (e.g. the
    v3 curation composition, measured ~1.4x end-to-end) otherwise.
    Pass ``checkpoint_input=False`` when the input is a bare parquet
    read that is cheaper to re-scan than to copy into the object
    store."""
    if checkpoint_input:
        ds = ds.materialize()

    def bucket_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray(
            [len(_NONWS_RE.findall(t)) for t in batch[text_col].to_pylist()],
            dtype=np.int64,
        )
        part = ids // bucket
        uniq, inv = np.unique(part, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, n)
        return pa.table(
            {
                "part": pa.array(uniq, pa.int64()),
                "n_sum": pa.array(sums, pa.int64()),
            }
        )

    from .dedup import driver_merge_sum

    # driver-bound integer token-sum partials: merge on the driver
    mdf = driver_merge_sum(
        ds.map_batches(bucket_partial, batch_format="pyarrow"),
        ["part"],
        ["n_sum"],
    )
    tbl = pa.Table.from_pandas(mdf, preserve_index=False)
    parts = tbl["part"].to_numpy(zero_copy_only=False).astype(np.int64)
    sums = tbl["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(parts)
    parts, sums = parts[order], sums[order]
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    bcast = ray.put((parts, offsets))

    def tag_part(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "part", pa.array(ids // bucket, pa.int64())
        )

    def within(group: pa.Table) -> pa.Table:
        parts_arr, offs = ray.get(bcast)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        texts = group[text_col].to_pylist()
        n = np.asarray(
            [len(_NONWS_RE.findall(texts[i])) for i in order],
            dtype=np.int64,
        )
        base = int(offs[np.searchsorted(parts_arr, ids[order[0]] // bucket)])
        starts = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "start_offset": pa.array(starts, pa.int64()),
                "example_id": pa.array(starts // seq_len, pa.int64()),
            }
        )

    return (
        ds.map_batches(tag_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(within, batch_format="pyarrow")
    )
