"""Boilerplate-paragraph detection and removal (C4-style curation).

A paragraph (trimmed line) that appears in many distinct documents is
boilerplate — nav text, footers, cookie banners — and large-corpus
curation strips it before training.  Reference parity: the reference's
extractors drop fixed page chrome per site profile (reference
``exchange/*.py`` content selectors); this is the corpus-statistical
generalization.

Scale design: paragraph document-frequency uses the combiner pattern
(per-batch partials over per-doc DISTINCT paragraphs — one corpus row
per doc means per-batch doc counts sum exactly); the boilerplate set
(rare by construction: df >= min_docs) is broadcast via ``ray.put`` as
a sorted hash array and probed with searchsorted inside the strip
stage — documents never shuffle.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

import ray


def _paras(text: str) -> list:
    """Trimmed (spaces/tabs, matching SQL ``trim(x, ' ' || chr(9))``)
    non-empty lines."""
    out = []
    for line in text.split("\n"):
        p = line.strip(" \t")
        if p:
            out.append(p)
    return out


def _para_hash(p: str) -> int:
    return int.from_bytes(
        hashlib.md5(p.encode("utf-8")).digest()[:8], "big"
    )


def paragraph_df(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """(paragraph, df): number of distinct documents containing each
    trimmed non-empty line."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(set(_paras(t)))
        return pa.table(
            {
                "paragraph": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("paragraph")
        .sum("df")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "paragraph": batch["paragraph"],
                "df": batch["sum(df)"].combine_chunks().cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def boilerplate_paragraphs(
    ds: "ray.data.Dataset", min_docs: int = 3, text_col: str = "text"
) -> "ray.data.Dataset":
    """Paragraphs appearing in >= ``min_docs`` distinct documents."""

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch["df"], pa.scalar(min_docs, pa.int64()))
        )

    return paragraph_df(ds, text_col=text_col).map_batches(
        keep, batch_format="pyarrow"
    )


def strip_boilerplate(
    ds: "ray.data.Dataset",
    boiler_ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Remove boilerplate lines from every document.  Lines are kept in
    order (including empty ones); a document whose every line was
    boilerplate is dropped.  The boilerplate set is broadcast once as a
    sorted md5-prefix hash array (8 bytes/paragraph, zero-copy reads)."""
    btbl = pa.concat_tables(
        ray.get(boiler_ds.to_arrow_refs()), promote_options="default"
    )
    hashes = np.sort(
        np.array(
            [_para_hash(p) for p in btbl["paragraph"].to_pylist()],
            dtype=np.uint64,
        )
    )
    boiler_ref = ray.put(hashes)

    def strip(batch: pa.Table) -> pa.Table:
        boiler = ray.get(boiler_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_txt = [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            kept = []
            any_kept = False
            for line in t.split("\n"):
                p = line.strip(" \t")
                if p:
                    h = np.uint64(_para_hash(p))
                    pos = int(np.searchsorted(boiler, h))
                    if pos < len(boiler) and boiler[pos] == h:
                        continue
                    any_kept = True
                kept.append(line)
            if any_kept:
                out_id.append(ids[i])
                out_txt.append("\n".join(kept))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                text_col: pa.array(out_txt, pa.string()),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow")
