"""Eval-set decontamination: flag corpus documents that share any word
n-gram with a (small) evaluation set.

This is the GPT-3 / PaLM decontamination rule (Brown et al. 2020 §C;
13-gram overlap there, n configurable here): before training, any
document overlapping the benchmark suite by an exact n-gram is dropped
so downstream eval numbers aren't contaminated.  Beyond-reference
operator (the reference crawls announcements; a 100-TB curation run
decontaminates before sharding).

Scale design: the eval set is small BY DEFINITION (benchmarks are
thousands of docs, the corpus is billions), so its n-gram set is built
once and broadcast via ``ray.put`` as an exact Python frozenset of
n-gram strings (no hashing — zero collision risk), then probed inside
``map_batches``; the corpus never shuffles and never materializes.  If
the eval side ever outgrew a broadcast, the fallback is the same
co-partition hash join used by ``dedup.attach_pair_texts``.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")


def _tokens(text: str) -> list:
    return [w.lower() for w in _WORD_RE.findall(text)]


def _ngrams(toks: list, n: int):
    for i in range(len(toks) - n + 1):
        yield " ".join(toks[i : i + n])


def eval_ngram_set(
    eval_ds: "ray.data.Dataset", n: int = 5, text_col: str = "text"
) -> frozenset:
    """Distinct word n-grams of the eval set (distributed extraction,
    tiny distinct result to the driver)."""

    def grams(batch: pa.Table) -> pa.Table:
        out = set()
        for t in batch[text_col].to_pylist():
            out.update(_ngrams(_tokens(t), n))
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    parts = ray.get(
        eval_ds.map_batches(grams, batch_format="pyarrow").to_arrow_refs()
    )
    merged: set = set()
    for p in parts:
        # blocks that were empty upstream can surface with an empty
        # schema (no "g" column) — nothing to merge from those
        if "g" in p.schema.names:
            merged.update(p["g"].to_pylist())
    return frozenset(merged)


def flag_contaminated(
    ds: "ray.data.Dataset",
    eval_grams: frozenset,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(id, contaminated): true iff the document shares >= 1 word
    n-gram with the eval set.  Early-exits on the first hit per doc."""
    grams_ref = ray.put(eval_grams)

    def flag(batch: pa.Table) -> pa.Table:
        grams: frozenset = ray.get(grams_ref)
        flags = []
        for t in batch[text_col].to_pylist():
            flags.append(
                any(g in grams for g in _ngrams(_tokens(t), n))
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "contaminated": pa.array(flags, pa.bool_()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def decontaminate(
    ds: "ray.data.Dataset",
    eval_ds: "ray.data.Dataset",
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Drop contaminated documents (keeps full rows of the clean
    ones)."""
    grams_ref = ray.put(eval_ngram_set(eval_ds, n=n, text_col=text_col))

    def keep_clean(batch: pa.Table) -> pa.Table:
        grams: frozenset = ray.get(grams_ref)
        mask = [
            not any(g in grams for g in _ngrams(_tokens(t), n))
            for t in batch[text_col].to_pylist()
        ]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep_clean, batch_format="pyarrow")
