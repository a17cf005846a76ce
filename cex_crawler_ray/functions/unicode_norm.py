"""Unicode normalization for webtext ingest.

Crawled text arrives in mixed normalization forms (decomposed
combining sequences from mac filesystems / some CMSes, compatibility
codepoints like U+212B ANGSTROM SIGN); corpus work that hashes,
shingles or token-matches text MUST see one canonical form or
identical strings land in different dedup buckets.  This is the NFC
pass CC-style text pipelines run right after charset transcoding
(see ``functions/charset.decode_batch`` — reference parity: the
reference engine never normalizes, which is one of its latent dedup
bugs this engine fixes).

``normalize_texts`` is a per-batch kernel: ``unicodedata.is_normalized``
(a C-level quick-check that allocates nothing on the
already-normalized fast path — the overwhelming majority of real
text) gates the actual ``normalize`` call.  Zero shuffle.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa


def normalize_texts(texts: list, form: str = "NFC"):
    """Return (normalized list, changed bool list).  Rows already in
    the requested form pass through untouched (quick-check fast
    path)."""
    out, changed = [], []
    for t in texts:
        if t is None:
            out.append(None)
            changed.append(False)
            continue
        if unicodedata.is_normalized(form, t):
            out.append(t)
            changed.append(False)
        else:
            out.append(unicodedata.normalize(form, t))
            changed.append(True)
    return out, changed


def normalize_column(
    batch: pa.Table,
    text_col: str = "text",
    form: str = "NFC",
    changed_col: str = "nfc_changed",
) -> pa.Table:
    """Arrow batch wrapper: replace ``text_col`` with its normalized
    form and append a ``changed`` flag column."""
    out, changed = normalize_texts(batch[text_col].to_pylist(), form)
    idx = batch.column_names.index(text_col)
    return batch.set_column(
        idx, text_col, pa.array(out, pa.string())
    ).append_column(changed_col, pa.array(changed, pa.bool_()))
