r"""Data-mixing operators: temperature-based domain resampling.

Multilingual / multi-domain training corpora are rebalanced before
training so head domains don't drown the tail (mBERT / XLM-R exponential
smoothing, alpha ~ 0.3-0.7; Gopher / The Pile per-source weights).  The
target distribution is q_s ∝ c_s^alpha; achieving it by subsampling
means per-source keep rate r_s ∝ c_s^(alpha-1), normalized so the
smallest source keeps everything:

    r_s = (c_min / c_s)^(1 - alpha)        (alpha = 0.5 -> sqrt decay)

Determinism contract (the repo-wide oracle trick): the rate is frozen
to integer PARTS-PER-MILLION via ``floor(1e6 * sqrt(c_min / c_s))`` —
one IEEE division, one correctly-rounded sqrt, one multiply, one floor,
each bit-identical between numpy and DuckDB — and membership is an
integer compare of the doc's md5-prefix u32 against the ppm rate, so
the sampled set hash-matches SQL exactly.

Scale shape: pass 1 is a partial count per batch + a one-row-per-source
groupby (the ENTIRE shuffle is #sources rows); the rate table is
broadcast via ``ray.put``; pass 2 is a stateless ``map_batches`` filter.
The corpus itself never shuffles and never materializes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


def source_rates(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    alpha: float = 0.5,
) -> pa.Table:
    """(source, n_docs, rate_ppm) — one row per source.

    Only ``alpha = 0.5`` is oracle-exact (sqrt is correctly rounded in
    every IEEE implementation; pow(x, 0.3) is not); other alphas work
    but carry last-ulp risk vs a SQL mirror.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            np.asarray(batch[group_col].to_pylist(), dtype=object),
            return_counts=True,
        )
        return pa.table(
            {
                group_col: pa.array(list(vals), pa.string()),
                "n_docs": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from .dedup import driver_merge_sum

    # driver-bound integer count partials: merge on the driver
    mdf = driver_merge_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col],
        ["n_docs"],
    )
    tbl = pa.Table.from_pandas(mdf, preserve_index=False)
    n = tbl["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    nmin = float(n.min())
    if alpha == 0.5:
        frac = np.sqrt(nmin / n.astype(np.float64))
    else:
        frac = (nmin / n.astype(np.float64)) ** (1.0 - alpha)
    rate = np.floor(1_000_000.0 * frac).astype(np.int64)
    return pa.table(
        {
            group_col: tbl[group_col],
            "n_docs": pa.array(n, pa.int64()),
            "rate_ppm": pa.array(rate, pa.int64()),
        }
    )


def temperature_sample(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> "ray.data.Dataset":
    """Deterministic temperature-resampled corpus: keep a doc iff its
    md5(text) 32-bit prefix falls under its source's ppm rate.

    Returns (id_col, group_col) rows.
    """
    # rate pass + keep pass both consume ds — pin at the fork
    ds = ds.materialize()
    rates = source_rates(ds, group_col=group_col, alpha=alpha)
    rate_map = dict(
        zip(rates[group_col].to_pylist(), rates["rate_ppm"].to_pylist())
    )
    bcast = ray.put(rate_map)

    def keep(batch: pa.Table) -> pa.Table:
        rm = ray.get(bcast)
        srcs = batch[group_col].to_pylist()
        texts = batch[text_col].to_pylist()
        mask = np.zeros(len(srcs), dtype=bool)
        for i, (s, t) in enumerate(zip(srcs, texts)):
            u32 = int(
                hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16
            )
            mask[i] = u32 * 1_000_000 < rm[s] * 4_294_967_296
        sub = batch.filter(pa.array(mask))
        return pa.table(
            {
                id_col: sub[id_col],
                group_col: sub[group_col],
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_priority_sample(
    ds: "ray.data.Dataset",
    k: int = 50,
    weight_col: str = "n_chars",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Deterministic weight-proportional sample of ``k`` rows (priority
    sampling, Duffield-Lund-Thorup 2007): rank every doc by
    ``u / w`` where ``u`` is its md5-u32 content prefix and ``w`` its
    weight (longer/better docs sample more often), keep the k smallest.

    Determinism contract: the priority is ONE IEEE double division —
    correctly rounded identically by numpy and DuckDB — with doc_id as
    the tie-break, so the sampled set hash-matches SQL exactly.

    Scale shape: per-batch partial top-k (each batch ships at most k
    rows), final top-k over <= k x blocks rows on the driver — the
    standard mergeable top-k; the corpus never shuffles.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(
            batch[weight_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            ),
            1,
        )
        u = np.asarray(
            [
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                for t in batch[text_col].to_pylist()
            ],
            dtype=np.int64,
        )
        pri = u.astype(np.float64) / w.astype(np.float64)
        order = np.lexsort((ids, pri))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "weight": pa.array(w[order], pa.int64()),
                "pri": pa.array(pri[order], pa.float64()),
            }
        )

    parts = pa.concat_tables(
        [
            t
            for t in ray.get(
                ds.map_batches(partial, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if t.num_rows and id_col in t.schema.names
        ]
        or [
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "weight": pa.array([], pa.int64()),
                    "pri": pa.array([], pa.float64()),
                }
            )
        ],
        promote_options="default",
    )
    ids = parts[id_col].to_numpy(zero_copy_only=False)
    w = parts["weight"].to_numpy(zero_copy_only=False)
    pri = parts["pri"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, pri))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "weight": pa.array(w[order], pa.int64()),
        }
    )
