"""DSIR-style data selection: hashed-feature importance scores.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
ranks a raw corpus by how target-like each document's hashed n-gram
profile is, then keeps the top of the ranking.  The reference engine
has no selection stage at all — it crawls a hand-picked host list
(reference ``collect_data.py``) — but any 100-TB pretraining pipeline
puts exactly this between dedup and tokenization.

Fixed-point variant: the published method scores a document by
``sum_f log(p_target(f) / p_raw(f))``.  Floating logs are
batch-order-fragile under the driver's value-hash gate, so this
operator uses the integer likelihood-ratio weight

    w[b] = (scale * (count_target[b] + 1)) // (count_raw[b] + 1)

per hash bucket (add-one smoothing on both sides) and scores a doc by
the int64 sum of ``w`` over its token instances — the same monotone
"target-like beats raw-like" ordering signal, bit-reproducible on both
the Ray side and the DuckDB twin.

Scale shape (two passes, both streaming):

1. bucket counts — each batch folds its token instances into ONE
   ``n_buckets``-row partial (np.add.at), and the partials are merged
   on the driver (``driver_merge_sum``: the table is bucket-bounded,
   it becomes a broadcast anyway, a shuffle round would be wasted).
2. scoring — the weight vector ships once via ``ray.put`` and every
   batch scores its docs vectorized against it.

Token→bucket hashing is md5-based (the one hash both numpy and DuckDB
can compute byte-identically) and memoized per worker process, so the
md5 cost is vocabulary-bounded, not corpus-bounded.

The optional ``keep_top`` flag marks the global top-K rows by
``(score DESC, doc_id ASC)``: the pivot row is found with a
two-int64-column ``sort().limit(K)`` (top-k, never a full
materialization) and broadcast; every row then flags itself with one
vectorized comparison — row_number() semantics without shipping ranks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .dedup import driver_merge_sum

# per-worker-process token -> bucket memo (vocabulary-bounded)
_BUCKET_CACHE: dict[int, dict[str, int]] = {}


def _bucket_of(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _doc_buckets(texts: list[str], n_buckets: int):
    """Per-doc bucket index arrays (one entry per token INSTANCE)."""
    cache = _BUCKET_CACHE.setdefault(n_buckets, {})
    out = []
    for t in texts:
        toks = t.split()
        bkts = np.empty(len(toks), dtype=np.int64)
        for i, tok in enumerate(toks):
            b = cache.get(tok)
            if b is None:
                b = _bucket_of(tok, n_buckets)
                cache[tok] = b
            bkts[i] = b
        out.append(bkts)
    return out


def dsir_scores(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 64,
    scale: int = 10**6,
    keep_top: int | None = None,
) -> "ray.data.Dataset":
    """Score every doc by target-likeness; optionally flag the top-K.

    Returns ``(id_col, score)`` rows, plus ``keep`` when ``keep_top``
    is set.  ``docs`` is consumed twice (counts, then scoring) so it is
    pinned here; pass a cheap projection.
    """
    docs = docs.materialize()

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        is_tgt = pc.equal(batch[target_col], target_value).to_numpy(
            zero_copy_only=False
        )
        c_raw = np.zeros(n_buckets, dtype=np.int64)
        c_tgt = np.zeros(n_buckets, dtype=np.int64)
        for bkts, t in zip(_doc_buckets(texts, n_buckets), is_tgt):
            np.add.at(c_raw, bkts, 1)
            if t:
                np.add.at(c_tgt, bkts, 1)
        return pa.table(
            {
                "bkt": pa.array(np.arange(n_buckets), pa.int64()),
                "c_raw": pa.array(c_raw, pa.int64()),
                "c_tgt": pa.array(c_tgt, pa.int64()),
            }
        )

    counts = driver_merge_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["bkt"],
        ["c_raw", "c_tgt"],
    )
    weights = np.full(n_buckets, scale, dtype=np.int64)  # empty buckets: (0+1)//(0+1)
    if len(counts):
        b = counts["bkt"].to_numpy().astype(np.int64)
        weights[b] = (
            scale * (counts["c_tgt"].to_numpy().astype(np.int64) + 1)
        ) // (counts["c_raw"].to_numpy().astype(np.int64) + 1)
    w_ref = ray.put(weights)

    def score(batch: pa.Table, _ref=w_ref) -> pa.Table:
        w = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        texts = batch[text_col].to_pylist()
        scores = np.fromiter(
            (
                int(w[bkts].sum()) if len(bkts) else 0
                for bkts in _doc_buckets(texts, n_buckets)
            ),
            dtype=np.int64,
            count=len(texts),
        )
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                "score": pa.array(scores, pa.int64()),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    if keep_top is None:
        return scored

    scored = scored.materialize()  # consumed twice: pivot probe + flagging
    top = (
        scored.sort(["score", id_col], descending=[True, False])
        .limit(keep_top)
        .to_pandas()
    )
    if len(top) < keep_top:
        # fewer rows than K: everything is kept
        pivot_score, pivot_id = np.int64(-(2**62)), np.int64(2**62)
    else:
        pivot_score = np.int64(top["score"].iloc[-1])
        pivot_id = np.int64(top[id_col].iloc[-1])

    def flag(batch: pa.Table) -> pa.Table:
        s = batch["score"].to_numpy(zero_copy_only=False)
        i = batch[id_col].to_numpy(zero_copy_only=False)
        keep = (s > pivot_score) | ((s == pivot_score) & (i <= pivot_id))
        return batch.append_column("keep", pa.array(keep, pa.bool_()))

    return scored.map_batches(flag, batch_format="pyarrow")
