"""Storage-layout optimization: Z-order (Morton) clustering + zone maps.

At 100 TB the dominant cost of every downstream query is the scan, and
the scan is only prunable if row groups are CLUSTERED on the predicate
columns.  A linear sort clusters one column; interleaving the bits of
two columns (the Morton / Z-order curve, the layout primitive behind
Delta Lake ``OPTIMIZE ZORDER BY`` and Hudi space-filling-curve
clustering) bounds BOTH columns' value ranges inside every contiguous
key range, so per-file min/max zone maps prune two-dimensional
predicates.

Everything here is integer-exact and combiner-shaped:

* ``morton_interleave16`` — vectorized numpy bit-spread of two 16-bit
  keys into one 32-bit Z-value (the classic mask-shift cascade; same
  expression mirrored in the SQL twin).
* ``zorder_zone_maps`` — assign each row's Z-bucket (top
  ``bucket_bits`` of the Z-value = one output file at scale) and
  reduce to per-bucket zone maps ``(bucket, n, min_x, max_x, min_y,
  max_y)``.  Per batch only one partial row per touched bucket enters
  the exchange; the final reduce is a coarse-partition vectorized
  min/max/sum.  The zone-map table is what a reader consults to skip
  buckets whose ranges miss the predicate.
* ``zorder_write`` — the sink form: repartition rows by Z-bucket and
  write one Parquet directory per bucket (resumable, prunable layout).

Reference parity note: the reference engine has no layout stage at all
(it writes one JSON per announcement, reference ``collect_data.py``
save path); this is a beyond-reference scale operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .dedup import _coarse_group_apply

_M8 = np.uint64(0x00FF00FF)
_M4 = np.uint64(0x0F0F0F0F)
_M2 = np.uint64(0x33333333)
_M1 = np.uint64(0x55555555)


def _spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value to even bit positions."""
    x = v.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & _M8
    x = (x | (x << np.uint64(4))) & _M4
    x = (x | (x << np.uint64(2))) & _M2
    x = (x | (x << np.uint64(1))) & _M1
    return x


def morton_interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Z-value from two 16-bit keys: x on even bits, y on odd."""
    return (_spread16(x) | (_spread16(y) << np.uint64(1))).astype(np.int64)


def zorder_zone_maps(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    bucket_bits: int = 10,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Zone-map table of the Z-order layout of ``ds`` on two int
    columns (values taken mod 2^16): one row per non-empty Z-bucket
    with exact n / min / max of both columns.  Shuffle carries at most
    one partial row per (batch, bucket)."""
    shift = np.uint64(32 - bucket_bits)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        x = (
            batch[x_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        y = (
            batch[y_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        xm = x % 65536
        ym = y % 65536
        z = morton_interleave16(xm, ym)
        b = (z.astype(np.uint64) >> shift).astype(np.int64)
        df = pd.DataFrame({"bucket": b, "x": xm, "y": ym})
        g = df.groupby("bucket", as_index=False).agg(
            n=("x", "size"),
            min_x=("x", "min"),
            max_x=("x", "max"),
            min_y=("y", "min"),
            max_y=("y", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_part(part: pa.Table) -> pa.Table:
        import pandas as pd

        df = part.to_pandas()
        g = df.groupby("bucket", as_index=False).agg(
            n=("n", "sum"),
            min_x=("min_x", "min"),
            max_x=("max_x", "max"),
            min_y=("min_y", "min"),
            max_y=("max_y", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _coarse_group_apply(partials, "bucket", reduce_part, num_parts)


def zorder_write(
    ds: "ray.data.Dataset",
    out_dir: str,
    x_col: str,
    y_col: str,
    bucket_bits: int = 6,
) -> None:
    """Write ``ds`` partitioned by Z-bucket (``zb=<bucket>/`` dirs):
    the resumable, two-column-prunable layout ``zorder_zone_maps``
    describes.  Rows gain a ``zb`` partition column."""
    shift = np.uint64(32 - bucket_bits)

    def add_bucket(batch: pa.Table) -> pa.Table:
        x = (
            batch[x_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        y = (
            batch[y_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        z = morton_interleave16(x % 65536, y % 65536)
        b = (z.astype(np.uint64) >> shift).astype(np.int64)
        return batch.append_column("zb", pa.array(b, pa.int64()))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["zb"]
    )
