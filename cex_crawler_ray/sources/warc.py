"""WARC (Web ARChive, ISO 28500) source + sink.

Common Crawl — the stated input shape for this engine (BASELINE.json
``input_hint``: "Common-Crawl-style web pages") — ships its corpus as
WARC files: concatenated records, each a CRLF-terminated header block
(WARC-Type, WARC-Target-URI, WARC-Date, Content-Length, ...) followed
by exactly Content-Length payload bytes and a blank-record separator.
This module adds that container as a first-class Ray Data source/sink
next to the Parquet page store:

* ``write_warc(ds, out_dir)`` — worker-written shards: each Arrow
  block serializes to ONE .warc file (resumable layout, no driver
  funnel), rows become ``response`` records.  The header set matches
  what a CC fetcher emits (Target-URI, Date, Record-ID,
  Identified-Content-Language, Content-Length).
* ``read_warc(dir)`` — ``ray.data.read_binary_files`` (streaming, one
  task per shard) + a per-file record scanner into
  (url, warc_ts, lang, payload) rows.  The scanner is a per-record
  loop, like every WARC parser (records are length-prefixed by
  Content-Length, so it is O(bytes) with no searching inside
  payloads); per-row vectorization is impossible for a
  variable-length concatenated container, and the loop is bounded by
  records-per-shard, not corpus size.
* ``compress="gzip"`` — the actual Common Crawl wire format is
  ``.warc.gz`` with ONE GZIP MEMBER PER RECORD (concatenated members,
  not whole-file compression): a consumer holding a (offset, length)
  index can range-request and decompress a single record without
  touching the rest of the shard.  The sink emits deterministic
  members (``mtime=0``) so shard names stay content-addressed and
  task re-execution is idempotent; the reader sniffs the gzip magic
  and inflates the member stream before the record scan, so ``.warc``
  and ``.warc.gz`` shards can coexist in one directory.

Reference parity note: the reference engine has no archive format (it
writes one JSON file per page, reference ``deepseek_analyzer.py``
save path); WARC is the scale-native equivalent of that sink for a
Common-Crawl-shaped corpus.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib

import pyarrow as pa
from ray.data import Datasink

_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def gzip_member(record: bytes, level: int = 6) -> bytes:
    """One deterministic gzip member per WARC record (mtime pinned to
    0 so identical records always produce identical bytes — shard
    names are content-hashed and resume depends on it)."""
    return gzip.compress(record, compresslevel=level, mtime=0)


def iter_gz_members(data: bytes):
    """Yield the decompressed payload of each gzip member in a
    concatenated-member stream.  This is the random-access contract of
    .warc.gz: each member is independently inflatable, so a reader
    with a byte-offset index needs only that member's bytes."""
    while data[:2] == _GZ_MAGIC:
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(data)
        data = d.unused_data
    if data:
        raise ValueError(
            "trailing non-gzip bytes after member stream (%d bytes)"
            % len(data)
        )


def _format_record(
    url: str,
    ts_iso: str,
    lang: str,
    payload: bytes,
    record_type: str = "response",
) -> bytes:
    rid = hashlib.md5(
        (url + "|" + ts_iso).encode("utf-8")
    ).hexdigest()  # deterministic record id (no uuid4: resumable)
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: " + record_type.encode("ascii") + _CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        + b"WARC-Date: " + ts_iso.encode("ascii") + _CRLF
        + b"WARC-Record-ID: <urn:md5:" + rid.encode("ascii") + b">" + _CRLF
    )
    if record_type in ("conversion", "metadata"):
        # WET convention: a conversion record points at the response
        # record it was derived from.  The id is the same deterministic
        # (url, ts) digest, so the WET and WARC sides of a corpus link
        # without any lookup table.
        head += (
            b"WARC-Refers-To: <urn:md5:" + rid.encode("ascii") + b">"
            + _CRLF
        )
    head += (
        b"WARC-Identified-Content-Language: "
        + lang.encode("utf-8") + _CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
        + _CRLF
    )
    return head + payload + _CRLF + _CRLF


class _WarcDatasink(Datasink):
    """Worker-written .warc shards.  The shard name carries the write
    task's deterministic ``task_idx`` plus the block ordinal, THEN the
    content hash: two distinct blocks that happen to serialize to
    identical bytes (replicated/tiled corpora) land in distinct files
    (multiset semantics preserved), while a re-executed task overwrites
    the very same names (idempotent resume).  Atomic rename so readers
    never see a torn shard."""

    def __init__(
        self,
        out_dir,
        url_col,
        ts_col,
        lang_col,
        payload_col,
        record_type: str = "response",
        compress: str | None = None,
    ):
        self.out_dir = out_dir
        self.cols = (url_col, ts_col, lang_col, payload_col)
        self.record_type = record_type
        if compress not in (None, "gzip"):
            raise ValueError(f"unsupported compress={compress!r}")
        self.compress = compress

    def on_write_start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)

    def write(self, blocks, ctx) -> int:
        url_col, ts_col, lang_col, payload_col = self.cols
        written = 0
        for i, block in enumerate(blocks):
            batch = pa.table(block) if not isinstance(block, pa.Table) else block
            # zero-row upstream batches can surface as schema-less
            # blocks (e.g. a filter that kept nothing) — nothing to
            # serialize either way
            if batch.num_rows == 0 or url_col not in batch.column_names:
                continue
            urls = batch[url_col].to_pylist()
            ts = batch[ts_col].to_pylist()
            langs = batch[lang_col].to_pylist()
            payloads = batch[payload_col].to_pylist()
            buf = bytearray()
            for u, t, lg, p in zip(urls, ts, langs, payloads):
                if isinstance(p, str):
                    p = p.encode("utf-8")
                iso = t.strftime("%Y-%m-%dT%H:%M:%SZ")
                rec = _format_record(
                    u, iso, lg or "", p or b"", self.record_type
                )
                # CC wire format: one gzip member PER RECORD so any
                # single record is range-fetchable + inflatable alone
                buf += gzip_member(rec) if self.compress else rec
            data = bytes(buf)
            digest = hashlib.sha256(data).hexdigest()[:16]
            ext = {
                "conversion": "warc.wet",  # WET: extracted text
                "metadata": "warc.wat",  # WAT: per-page JSON metadata
            }.get(self.record_type, "warc")
            if self.compress:
                ext += ".gz"
            name = f"part-{ctx.task_idx:05d}-{i:03d}-{digest}.{ext}"
            path = os.path.join(self.out_dir, name)
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            written += batch.num_rows
        return written


def write_warc(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    lang_col: str = "lang",
    payload_col: str = "html",
    record_type: str = "response",
    compress: str | None = None,
) -> None:
    """Serialize blocks to .warc shards, written BY THE WORKER via a
    Datasink (task-idx-discriminated names -> idempotent under task
    re-execution AND no collapse of identical-byte blocks).
    ``compress="gzip"`` emits .warc.gz with per-record members."""
    ds.write_datasink(
        _WarcDatasink(
            out_dir,
            url_col,
            ts_col,
            lang_col,
            payload_col,
            record_type,
            compress=compress,
        )
    )


def write_wat(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "wat_json",
    compress: str | None = None,
) -> None:
    """WAT sink: ISO 28500 ``metadata`` records carrying per-page JSON
    metadata (outlinks, headers — whatever the caller serialized into
    ``payload_col``) — the Common Crawl WAT companion.  Shards are
    ``.warc.wat``; ``read_warc`` parses them identically."""

    def _blank_lang(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__lang", pa.array([""] * batch.num_rows, pa.string())
        )

    write_warc(
        ds.map_batches(_blank_lang, batch_format="pyarrow"),
        out_dir,
        url_col=url_col,
        ts_col=ts_col,
        lang_col="__lang",
        payload_col=payload_col,
        record_type="metadata",
        compress=compress,
    )


def write_wet(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    lang_col: str = "lang",
    text_col: str = "text",
    compress: str | None = None,
) -> None:
    """WET sink: ISO 28500 ``conversion`` records carrying extracted
    TEXT — the Common Crawl companion format to the response-record
    .warc container (one WET record per page, WARC-Refers-To linking it
    to its response record by the same deterministic id).  Shards are
    ``.warc.wet``; ``read_warc`` parses them identically (the format is
    header-compatible, only WARC-Type and the payload differ)."""
    write_warc(
        ds,
        out_dir,
        url_col=url_col,
        ts_col=ts_col,
        lang_col=lang_col,
        payload_col=text_col,
        record_type="conversion",
        compress=compress,
    )


def parse_warc_bytes(data: bytes) -> dict:
    """Scan one WARC shard into parallel lists (url, warc_ts iso, lang,
    payload bytes).  Length-prefixed records: O(bytes), no scanning
    inside payloads."""
    urls, tss, langs, payloads = [], [], [], []
    types, refers = [], []
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:  # [0] is the WARC/1.0 line
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        body_start = head_end + 4
        payload = data[body_start : body_start + clen]
        urls.append(fields.get("warc-target-uri", ""))
        tss.append(fields.get("warc-date", ""))
        langs.append(fields.get("warc-identified-content-language", ""))
        payloads.append(payload)
        types.append(fields.get("warc-type", ""))
        refers.append(fields.get("warc-refers-to", ""))
        pos = body_start + clen + 4  # skip payload + record separator
    return {
        "url": urls,
        "warc_ts": tss,
        "lang": langs,
        "payload": payloads,
        "warc_type": types,
        "refers_to": refers,
    }


def read_warc(path_or_dir: str):
    """Streaming WARC read: one task per shard file."""
    import ray

    files = ray.data.read_binary_files(path_or_dir)

    def parse(batch: pa.Table) -> pa.Table:
        out = {"url": [], "warc_ts": [], "lang": [], "payload": []}
        for data in batch["bytes"].to_pylist():
            if data[:2] == _GZ_MAGIC:
                # .warc.gz: concatenated per-record members — inflate
                # the member stream, then scan records as usual
                data = gzip.decompress(data)
            rec = parse_warc_bytes(data)
            for k in out:
                out[k].extend(rec[k])
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "warc_ts": pa.compute.strptime(
                    pa.array(out["warc_ts"], pa.string()),
                    format="%Y-%m-%dT%H:%M:%SZ",
                    unit="us",
                ),
                "lang": pa.array(out["lang"], pa.string()),
                "payload": pa.array(out["payload"], pa.binary()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
