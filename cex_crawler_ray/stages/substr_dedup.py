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
2. coarse-partition on the gram hash (the ``_coarse_group_apply``
   pattern — per-gram ``map_groups`` would pay a Python call per
   near-singleton group), then a VECTORIZED first-occurrence drop per
   distinct gram inside each partition.  Two carry modes:

   - ``carry="hash"`` (default, the 100-TB configuration): each
     window is represented by a 128-bit content hash — two
     independent 64-bit polynomial rolling hashes over per-token
     blake2b halves, fully vectorized (no per-window Python work, no
     per-window digest call).  The exchange ships 4 int64s per token
     position instead of a ~50-byte gram string (~4x less shuffle
     volume) and the map side is ~10x faster.  Collision odds for a
     10^12-window corpus are ~1e-14 (birthday bound at 2^-128).
   - ``carry="string"``: ships the gram string and compares by
     content inside the partition — zero collision risk; the
     belt-and-braces oracle configuration.  A pytest pins both modes
     equal on the test corpora.
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

# polynomial rolling-hash multipliers (odd 64-bit constants; golden
# ratio / xxhash primes) — arithmetic wraps mod 2^64 in numpy uint64
_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)

# per-worker-process token-hash cache; the vocabulary is tiny next to
# the token stream, so each distinct token pays one blake2b ever
_TOK_CACHE: dict[str, tuple[int, int]] = {}
_TOK_CACHE_MAX = 1 << 20


def _token_hash_halves(toks: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per token (blake2b-128 halves)."""
    from hashlib import blake2b

    h1 = np.empty(len(toks), np.uint64)
    h2 = np.empty(len(toks), np.uint64)
    cache = _TOK_CACHE
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            d = blake2b(t.encode(), digest_size=16).digest()
            v = (
                int.from_bytes(d[:8], "little"),
                int.from_bytes(d[8:], "little"),
            )
            if len(cache) < _TOK_CACHE_MAX:
                cache[t] = v
        h1[i] = v[0]
        h2[i] = v[1]
    return h1, h2


def _window_poly(h: np.ndarray, mult: np.uint64, k: int) -> np.ndarray:
    """Vectorized k-window polynomial hash: H(i) = sum th[i+j]*M^(k-1-j)
    (mod 2^64).  k vector ops total; no per-window Python work."""
    n = h.shape[0] - k + 1
    acc = np.zeros(n, np.uint64)
    pw = np.uint64(1)
    for j in range(k - 1, -1, -1):
        acc = acc + h[j : j + n] * pw
        pw = pw * mult
    return acc


def duplicated_window_starts(
    ds: "ray.data.Dataset",
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
    carry: str = "hash",
) -> "ray.data.Dataset":
    """(doc_id, pos) rows — 1-based token index of every k-token window
    that exactly repeats a window with a smaller (doc_id, pos).

    ``carry``: "hash" ships a 128-bit rolling content hash per window
    (vectorized, 4x less shuffle volume — the scale default);
    "string" ships the gram text and compares by content (zero
    collision risk).  A pytest pins both modes equal.
    """
    if carry not in ("hash", "string"):
        raise ValueError(f"carry must be 'hash' or 'string', got {carry!r}")

    def windows_hash(batch: pa.Table) -> pa.Table:
        h1s: list[np.ndarray] = []
        h2s: list[np.ndarray] = []
        ids: list[np.ndarray] = []
        pos: list[np.ndarray] = []
        for d, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = _WORD_RE.findall(t.lower())
            n = len(toks) - k + 1
            if n <= 0:
                continue
            th1, th2 = _token_hash_halves(toks)
            h1s.append(_window_poly(th1, _M1, k))
            h2s.append(_window_poly(th2, _M2, k))
            ids.append(np.full(n, d, np.int64))
            pos.append(np.arange(1, n + 1, dtype=np.int64))
        if not ids:
            return pa.table(
                {
                    "gram_h1": pa.array([], pa.uint64()),
                    "gram_h2": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "gram_h1": pa.array(np.concatenate(h1s)),
                "gram_h2": pa.array(np.concatenate(h2s)),
                "doc_id": pa.array(np.concatenate(ids)),
                "pos": pa.array(np.concatenate(pos)),
            }
        )

    def mark_part_hash(part: pa.Table) -> pa.Table:
        h1 = part["gram_h1"].to_numpy(zero_copy_only=False)
        h2 = part["gram_h2"].to_numpy(zero_copy_only=False)
        d = part["doc_id"].to_numpy(zero_copy_only=False)
        p = part["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d, h2, h1))
        dup = np.zeros(len(order), bool)
        if len(order) > 1:
            same = (h1[order][1:] == h1[order][:-1]) & (
                h2[order][1:] == h2[order][:-1]
            )
            dup[1:] = same
        sel = order[dup]
        return pa.table(
            {
                "doc_id": pa.array(d[sel], pa.int64()),
                "pos": pa.array(p[sel], pa.int64()),
            }
        )

    def windows_string(batch: pa.Table) -> pa.Table:
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

    def mark_part_string(part: pa.Table) -> pa.Table:
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

    if carry == "hash":
        return _coarse_group_apply(
            ds.map_batches(windows_hash, batch_format="pyarrow"),
            "gram_h1",
            mark_part_hash,
            num_parts,
        )
    return _coarse_group_apply(
        ds.map_batches(windows_string, batch_format="pyarrow"),
        "gram_hash",
        mark_part_string,
        num_parts,
    )


def dup_spans(
    ds: "ray.data.Dataset",
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
    carry: str = "hash",
) -> "ray.data.Dataset":
    """Merge duplicated window starts into maximal token spans.

    Returns (doc_id, span_start, span_end) — 1-based inclusive token
    indices of every span covered by non-first duplicated k-windows.
    """
    marks = duplicated_window_starts(
        ds,
        k=k,
        text_col=text_col,
        id_col=id_col,
        num_parts=num_parts,
        carry=carry,
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
    carry: str = "hash",
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

    The input is consumed TWICE (span discovery + the document side of
    the union), so it is materialized once up front — Ray Data re-runs
    a lazy graph per consumer, which turns a long upstream chain (e.g.
    the v2 curation pipeline) into 2 full re-executions otherwise.  At
    100 TB this materialize is the standard checkpoint-before-fan-out:
    one object-store copy (spillable) instead of recomputing every
    upstream stage.
    """
    ds = ds.materialize()
    spans = dup_spans(
        ds,
        k=k,
        text_col=text_col,
        id_col=id_col,
        num_parts=num_parts,
        carry=carry,
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


def exact_substr_spans(
    ds: "ray.data.Dataset",
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 64,
    carry: str = "hash",
) -> "ray.data.Dataset":
    """ExactSubstr dedup at the paper's parameterization (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    §4.1: remove every repeated substring of >= 50 tokens, keeping the
    first occurrence).

    Suffix-array fidelity without a suffix array: suffix ``i`` of a
    document belongs to the SUFFIX GROUP keyed by the rolling hash of
    its first ``min_len`` tokens, so the windowed exchange of
    ``duplicated_window_starts`` IS a hashed-prefix suffix partition —
    two suffixes land in one partition iff their min_len-prefixes are
    equal, exactly the property the SA construction sorts for.  A
    substring of length L >= min_len repeats iff each of its
    L - min_len + 1 prefix windows repeats, so the merged keep-first
    islands equal the SA formulation's maximal removal spans — same
    output, but streaming (one content-keyed all-to-all sized by
    corpus tokens; the SA build is an O(n log n) global sort that
    cannot stream).

    Returns (doc_id, span_start, span_end, span_len): 1-based
    inclusive token spans of every maximal >= min_len-token repeat
    occurrence after the first, with its exact length.
    """
    spans = dup_spans(
        ds,
        k=min_len,
        text_col=text_col,
        id_col=id_col,
        num_parts=num_parts,
        carry=carry,
    )

    def with_len(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "span_len",
            pc.add(
                pc.subtract(batch["span_end"], batch["span_start"]),
                pa.scalar(1, pa.int64()),
            ),
        )

    return spans.map_batches(with_len, batch_format="pyarrow")
