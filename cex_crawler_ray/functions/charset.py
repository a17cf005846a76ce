"""Charset sniffing + transcoding for fetched page bytes.

A real crawl never gets to assume UTF-8: HTTP bodies arrive in
UTF-16 (BOM'd), legacy Latin-1/CP1252, EUC/GBK families, often with
the charset stated only INSIDE the document (``<meta charset=...>`` —
which requires a tentative ASCII-superset decode to even read).
Common Crawl runs exactly this detection per page and records the
result as ``WARC-Identified-Content-Charset``; the reference engine
inherits ``response.encoding`` from requests/Playwright (reference
``exchange/base_scraper.py:242-253``) and never handles the failure
modes.

``sniff_charset`` implements the deterministic precedence the WHATWG
encoding standard gives a byte stream with no transport header:

1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — authoritative, overrides all;
2. a ``<meta charset=...>`` / ``http-equiv Content-Type`` declaration
   found by scanning a bounded ASCII-superset prefix of the bytes;
3. the caller's default (UTF-8 here — the modern web's prior).

``decode_batch`` then transcodes to UTF-8 strings, replacing
undecodable bytes (count reported) — the ingest normalization step
every downstream text stage assumes.  Per-row codec calls are the
honest cost (Python's codecs are C; there is no vectorized charset
decode), bounded at one call per PAGE — the same granularity as the
extract stage's HTML parse.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

# charset declarations inside the first KB, per the HTML spec's
# prescan: <meta charset="..."> and the legacy http-equiv form
_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([A-Za-z0-9_\-]+))""",
    re.IGNORECASE | re.DOTALL,
)

_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "gbk": "gbk",
    "euc-kr": "euc_kr",
    "shift_jis": "shift_jis",
}

PRESCAN_BYTES = 1024


def _sniff(payload: bytes, default: str) -> tuple[str, int]:
    """(codec name, BOM length to strip before decoding)."""
    if payload is None:
        return default, 0
    for bom, enc in _BOMS:
        if payload[: len(bom)] == bom:
            # utf-8-sig strips its own BOM; utf-16 needs it stripped
            return enc, (0 if enc == "utf-8-sig" else len(bom))
    m = _META_RE.search(payload[:PRESCAN_BYTES])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        return _ALIASES.get(name, default), 0
    return default, 0


def sniff_charset(payload: bytes, default: str = "utf-8") -> str:
    """BOM > in-document meta declaration > default."""
    return _sniff(payload, default)[0]


def decode_batch(batch: pa.Table, payload_col: str = "html") -> pa.Table:
    """Sniff + transcode every payload to UTF-8 text.

    Appends ``charset`` (sniffed name), ``text_u8`` (decoded string)
    and ``bad_bytes`` (count of replacement characters produced —
    non-zero means the sniff or the page was wrong)."""
    payloads = batch[payload_col].to_pylist()
    charsets: list[str] = []
    texts: list[str] = []
    bad = np.zeros(len(payloads), dtype=np.int64)
    for i, p in enumerate(payloads):
        enc, skip = _sniff(p, "utf-8")
        charsets.append(enc)
        if p is None:
            texts.append("")
            continue
        s = p[skip:].decode(enc, "replace")
        nb = s.count("�")
        if nb:
            bad[i] = nb
        texts.append(s)
    return (
        batch.append_column("charset", pa.array(charsets, pa.string()))
        .append_column("text_u8", pa.array(texts, pa.string()))
        .append_column("bad_bytes", pa.array(bad, pa.int64()))
    )
