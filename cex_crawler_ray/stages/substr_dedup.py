r"""Exact substring-level deduplication (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find every token span that exactly repeats a k-token
window already seen elsewhere in the corpus, keeping the FIRST
occurrence (smallest (doc_id, position)) and marking all others for
removal.

This is finer-grained than document dedup (``stages/dedup.py``): two
mostly-different documents sharing one boilerplate paragraph get just
that paragraph marked.

Pipeline shape (all Ray Data, no driver state):

1. ``map_batches``: tokenize (the same ``[A-Za-z0-9_]+`` lowercase
   tokenizer as ``stages/decontam.py``), emit one
   (gram, gram_hash, doc_id, pos) row per k-token window.
2. coarse-partition on ``gram_hash`` (the ``_coarse_group_apply``
   pattern — per-gram ``map_groups`` would pay a Python call per
   near-singleton group), then a VECTORIZED first-occurrence drop per
   distinct gram STRING inside each partition.  Grouping on the string
   makes the match exact (zero collision risk — the hash only routes
   the shuffle; colliding grams still compare by content).  At 100 TB
   you would ship only (gram_hash, doc_id, pos) and accept ~1e-20
   collision odds for ~10x less shuffle volume; the string-carrying
   configuration is the oracle-exact one.
3. coarse-partition on ``doc_id``: merge marked window starts into
   maximal token spans — window [p, p+k-1] unions with the next marked
   start p' iff p' <= p + k (vectorized gap-and-island).

The step-2 exchange carries one row per token position — the
suffix-array-free formulation of exact substring dedup, sized by total
corpus token count.  That single content-keyed all-to-all IS the dedup
work; nothing else shuffles and nothing reaches the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray

from .dedup import _coarse_group_apply, _hash64

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")


def duplicated_window_starts(
    ds: "ray.data.Dataset",
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """(doc_id, pos) rows — 1-based token index of every k-token window
    that exactly repeats a window with a smaller (doc_id, pos)."""

    def windows(batch: pa.Table) -> pa.Table:
        gs: list[str] = []
        ids: list[int] = []
        pos: list[int] = []
        for d, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            for i in range(len(toks) - k + 1):
                gs.append(" ".join(toks[i : i + k]))
                ids.append(d)
                pos.append(i + 1)
        return pa.table(
            {
                "gram": pa.array(gs, pa.string()),
                "gram_hash": pa.array(
                    [_hash64(g) for g in gs], pa.uint64()
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    def mark_part(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        df.sort_values(
            ["gram", "doc_id", "pos"], inplace=True, kind="mergesort"
        )
        # non-first occurrence of each distinct gram string, and the
        # gram must occur >= 2 times to mark anything — both are the
        # same vectorized predicate
        dup = df["gram"].duplicated(keep="first")
        out = df.loc[dup, ["doc_id", "pos"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    return _coarse_group_apply(
        ds.map_batches(windows, batch_format="pyarrow"),
        "gram_hash",
        mark_part,
        num_parts,
    )


def dup_spans(
    ds: "ray.data.Dataset",
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Merge duplicated window starts into maximal token spans.

    Returns (doc_id, span_start, span_end) — 1-based inclusive token
    indices of every span covered by non-first duplicated k-windows.
    """
    marks = duplicated_window_starts(
        ds, k=k, text_col=text_col, id_col=id_col, num_parts=num_parts
    )

    def islands(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "span_start": pa.array([], pa.int64()),
                    "span_end": pa.array([], pa.int64()),
                }
            )
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        # new island when the doc changes or the gap exceeds the window
        # overlap reach: [p_prev, p_prev+k-1] ∪ [p, p+k-1] is contiguous
        # iff p <= p_prev + k
        new = np.concatenate(
            ([True], (d[1:] != d[:-1]) | (p[1:] > p[:-1] + k))
        )
        idx = np.flatnonzero(new)
        last = np.concatenate((idx[1:] - 1, [len(p) - 1]))
        return pa.table(
            {
                "doc_id": pa.array(d[idx], pa.int64()),
                "span_start": pa.array(p[idx], pa.int64()),
                "span_end": pa.array(p[last] + k - 1, pa.int64()),
            }
        )

    return _coarse_group_apply(marks, "doc_id", islands, num_parts)


def strip_dup_spans(
    ds: "ray.data.Dataset",
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """The full Lee-et-al rewrite: remove every duplicated span (the
    non-first occurrences found by ``dup_spans``) from each document's
    token stream.

    Returns (doc_id, text_deduped, n_removed) — ``text_deduped`` is the
    space-joined lowercase kept tokens (the canonical normalized form;
    original whitespace is not preserved, same as the tokenized
    training stream this feeds), ``n_removed`` the dropped token count.

    Shuffle shape: spans (two int64s per span) and documents are
    co-partitioned on ``doc_id`` with one union + coarse groupby — the
    corpus text crosses the exchange exactly once, which is the same
    cost as any keyed rewrite; nothing reaches the driver.
    """
    spans = dup_spans(
        ds, k=k, text_col=text_col, id_col=id_col, num_parts=num_parts
    )

    def doc_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "text": batch[text_col].combine_chunks().cast(pa.string()),
                "span_start": pa.array([None] * n, pa.int64()),
                "span_end": pa.array([None] * n, pa.int64()),
            }
        )

    def span_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array([None] * n, pa.string()),
                "span_start": batch["span_start"],
                "span_end": batch["span_end"],
            }
        )

    unioned = ds.map_batches(doc_rows, batch_format="pyarrow").union(
        spans.map_batches(span_rows, batch_format="pyarrow")
    )

    def apply(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        is_doc = df["text"].notna()
        span_map: dict = {}
        for d, s, e in zip(
            df.loc[~is_doc, "doc_id"],
            df.loc[~is_doc, "span_start"],
            df.loc[~is_doc, "span_end"],
        ):
            span_map.setdefault(int(d), []).append((int(s), int(e)))
        out_id: list[int] = []
        out_text: list[str] = []
        out_removed: list[int] = []
        for d, t in zip(df.loc[is_doc, "doc_id"], df.loc[is_doc, "text"]):
            toks = [w.lower() for w in _WORD_RE.findall(t)]
            mask = np.ones(len(toks), dtype=bool)
            for s, e in span_map.get(int(d), []):
                mask[s - 1 : e] = False  # spans are 1-based inclusive
            out_id.append(int(d))
            out_text.append(
                " ".join(tok for tok, m in zip(toks, mask) if m)
            )
            out_removed.append(int((~mask).sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text_deduped": pa.array(out_text, pa.string()),
                "n_removed": pa.array(out_removed, pa.int64()),
            }
        )

    return _coarse_group_apply(unioned, "doc_id", apply, num_parts)
