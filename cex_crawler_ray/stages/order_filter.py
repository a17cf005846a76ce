"""Exact distributed order-statistic band filter.

Keeps rows whose value lies between the exact p_lo and p_hi order
statistics of the whole corpus — the rank-based cousin of a fixed
length threshold (C4 drops too-short/too-long docs by constants; a
percentile band adapts to the corpus).  Beyond-reference operator.

Scale design: the value distribution is reduced with the combiner
pattern — each ``map_batches`` task emits a (value, count) histogram
partial, the groupby shuffle carries one row per (batch, distinct
value), and only the merged histogram (bounded by the number of
DISTINCT values — e.g. document lengths, a few thousand rows) reaches
the driver.  The two cut values are then closure-captured ints; the
filter pass streams.  For unbounded/continuous value domains use the
mergeable bottom-k quantile sketch (``stages/sketch.py``) instead —
this operator is the exact path for integer-bounded domains.

The order statistic at fraction ``f`` over N rows is the value at
1-based rank ``ceil(f * N)`` in sorted order (the smallest value whose
cumulative count reaches the rank) — identical to SQL
``ORDER BY v OFFSET ceil(f * cnt) - 1 LIMIT 1``.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

import ray


def value_band_cuts(
    hist: "pa.Table", lo_frac: float, hi_frac: float
) -> tuple:
    """(lo_val, hi_val) from a merged (v, c) histogram table."""
    v = hist["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = hist["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    rank_lo = math.ceil(lo_frac * n)
    rank_hi = math.ceil(hi_frac * n)
    lo_val = int(v[np.searchsorted(cum, rank_lo)])
    hi_val = int(v[np.searchsorted(cum, rank_hi)])
    return lo_val, hi_val


def length_band_filter(
    ds: "ray.data.Dataset",
    lo_frac: float = 0.1,
    hi_frac: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(id, n_chars) of documents whose character length lies within
    the corpus's [p_lo, p_hi] order-statistic band."""
    # histogram pass + keep pass both consume ds — pin at the fork
    ds = ds.materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        c = Counter(len(t) for t in batch[text_col].to_pylist())
        return pa.table(
            {
                "v": pa.array(list(c.keys()), pa.int64()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    from .dedup import driver_merge_sum

    # driver-bound integer histogram partials: merge on the driver
    hist = pa.Table.from_pandas(
        driver_merge_sum(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            ["v"],
            ["c"],
        ),
        preserve_index=False,
    )
    lo_val, hi_val = value_band_cuts(hist, lo_frac, hi_frac)

    def keep(batch: pa.Table) -> pa.Table:
        lens = np.asarray(
            [len(t) for t in batch[text_col].to_pylist()], dtype=np.int64
        )
        mask = (lens >= lo_val) & (lens <= hi_val)
        out = pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(lens, pa.int64()),
            }
        )
        return out.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
