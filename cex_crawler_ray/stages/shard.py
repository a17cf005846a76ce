"""Training-shard writer: deterministic hash-sharded corpus output.

The last stage of a curation run writes the surviving documents into N
shards for the training dataloader.  A true ``random_shuffle`` is an
all-to-all exchange of every byte; a multiplicative-hash shard
assignment decorrelates document order from crawl order just as well
for dataloader purposes and needs NO shuffle at all — each task tags
its rows and the partitioned write scatters files under
``shard=<k>/`` directories (resumable: a re-run can skip finished
shard partitions).

The hash is Knuth's multiplicative scheme on the document id —
``(doc_id * 2654435761) mod 2^32 mod N`` — chosen because it is
integer-exact in any engine (the SQL oracle reproduces it verbatim).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

KNUTH = 2654435761


def assign_shards(
    ds: "ray.data.Dataset", num_shards: int, id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Append a ``shard`` column; no shuffle."""

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (ids * KNUTH) % (1 << 32) % num_shards
        return batch.append_column(
            "shard", pa.array(shard.astype(np.int64), pa.int64())
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def write_training_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    num_shards: int = 16,
    id_col: str = "doc_id",
) -> None:
    """Hash-sharded hive-partitioned Parquet: ``shard=<k>/*.parquet``."""
    assign_shards(ds, num_shards, id_col=id_col).write_parquet(
        out_dir, partition_cols=["shard"]
    )


def shard_summary(
    shard_dir: str, text_col: str = "text"
) -> "ray.data.Dataset":
    """Read a shard directory back and report (shard, n_docs, n_chars)
    — the manifest a dataloader (or a resume check) consumes."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        shard = batch["shard"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lens = pc.utf8_length(batch[text_col]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        uniq = np.unique(shard)
        return pa.table(
            {
                "shard": pa.array(uniq, pa.int64()),
                "n_docs": pa.array(
                    [int((shard == s).sum()) for s in uniq], pa.int64()
                ),
                "n_chars": pa.array(
                    [int(lens[shard == s].sum()) for s in uniq],
                    pa.int64(),
                ),
            }
        )

    agg = (
        ray.data.read_parquet(shard_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .sum(["n_docs", "n_chars"])
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "shard": batch["shard"],
                "n_docs": batch["sum(n_docs)"]
                .combine_chunks()
                .cast(pa.int64()),
                "n_chars": batch["sum(n_chars)"]
                .combine_chunks()
                .cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")
