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
    payload_digest: str | None = None,
    refers_uri: str | None = None,
    refers_date: str | None = None,
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
    if payload_digest:
        # CC convention: responses AND revisits carry the payload
        # digest so index builds / dedup never re-hash stored bytes.
        head += (
            b"WARC-Payload-Digest: sha256:"
            + payload_digest.encode("ascii") + _CRLF
        )
    if record_type == "revisit":
        # The IIPC identical-payload-digest profile: a later capture
        # whose payload digest already exists in the archive stores NO
        # payload, only a pointer at the first capture.
        head += (
            b"WARC-Profile: "
            b"http://netpreserve.org/warc/1.0/revisit/"
            b"identical-payload-digest" + _CRLF
        )
        if refers_uri:
            head += (
                b"WARC-Refers-To-Target-URI: "
                + refers_uri.encode("utf-8") + _CRLF
            )
        if refers_date:
            head += (
                b"WARC-Refers-To-Date: "
                + refers_date.encode("ascii") + _CRLF
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
        type_col: str | None = None,
        digest_col: str | None = None,
        refers_url_col: str | None = None,
        refers_ts_col: str | None = None,
    ):
        self.out_dir = out_dir
        self.cols = (url_col, ts_col, lang_col, payload_col)
        self.record_type = record_type
        if compress not in (None, "gzip"):
            raise ValueError(f"unsupported compress={compress!r}")
        self.compress = compress
        # revisit-dedup mode: record type / digest / refers-to come
        # from per-row columns instead of one sink-wide constant
        self.type_col = type_col
        self.digest_col = digest_col
        self.refers_url_col = refers_url_col
        self.refers_ts_col = refers_ts_col

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
            n = batch.num_rows
            types = (
                batch[self.type_col].to_pylist()
                if self.type_col
                else [self.record_type] * n
            )
            digests = (
                batch[self.digest_col].to_pylist()
                if self.digest_col
                else [None] * n
            )
            r_urls = (
                batch[self.refers_url_col].to_pylist()
                if self.refers_url_col
                else [None] * n
            )
            r_ts = (
                batch[self.refers_ts_col].to_pylist()
                if self.refers_ts_col
                else [None] * n
            )
            buf = bytearray()
            for u, t, lg, p, rt, dg, ru, rd in zip(
                urls, ts, langs, payloads, types, digests, r_urls, r_ts
            ):
                if isinstance(p, str):
                    p = p.encode("utf-8")
                iso = t.strftime("%Y-%m-%dT%H:%M:%SZ")
                if rt == "revisit":
                    p = b""  # revisit stores NO payload, only headers
                rec = _format_record(
                    u,
                    iso,
                    lg or "",
                    p or b"",
                    rt,
                    payload_digest=dg or None,
                    refers_uri=ru or None,
                    refers_date=rd or None,
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
    digests, r_urls, r_ts = [], [], []
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
        dg = fields.get("warc-payload-digest", "")
        digests.append(dg.partition(":")[2] if ":" in dg else dg)
        r_urls.append(fields.get("warc-refers-to-target-uri", ""))
        r_ts.append(fields.get("warc-refers-to-date", ""))
        pos = body_start + clen + 4  # skip payload + record separator
    return {
        "url": urls,
        "warc_ts": tss,
        "lang": langs,
        "payload": payloads,
        "warc_type": types,
        "refers_to": refers,
        "payload_digest": digests,
        "refers_url": r_urls,
        "refers_ts": r_ts,
    }


def read_warc(path_or_dir: str, full: bool = False):
    """Streaming WARC read: one task per shard file.  ``full=True``
    adds the revisit-dedup columns (warc_type, payload_digest,
    refers_url, refers_ts) next to the base (url, warc_ts, lang,
    payload) schema."""
    import ray

    files = ray.data.read_binary_files(path_or_dir)
    extra = ("warc_type", "payload_digest", "refers_url", "refers_ts")

    def parse(batch: pa.Table) -> pa.Table:
        out = {"url": [], "warc_ts": [], "lang": [], "payload": []}
        if full:
            out.update({k: [] for k in extra})
        for data in batch["bytes"].to_pylist():
            if data[:2] == _GZ_MAGIC:
                # .warc.gz: concatenated per-record members — inflate
                # the member stream, then scan records as usual
                data = gzip.decompress(data)
            rec = parse_warc_bytes(data)
            for k in out:
                out[k].extend(rec[k])
        cols = {
            "url": pa.array(out["url"], pa.string()),
            "warc_ts": pa.compute.strptime(
                pa.array(out["warc_ts"], pa.string()),
                format="%Y-%m-%dT%H:%M:%SZ",
                unit="us",
            ),
            "lang": pa.array(out["lang"], pa.string()),
            "payload": pa.array(out["payload"], pa.binary()),
        }
        if full:
            for k in extra:
                cols[k] = pa.array(out[k], pa.string())
        return pa.table(cols)

    return files.map_batches(parse, batch_format="pyarrow")


# ------------------------------------------------------- revisit dedup
# The IIPC "identical-payload-digest" revisit profile is how web
# archives (Common Crawl's crawler, Heritrix, wayback writers) avoid
# re-storing unchanged pages across recrawls: the FIRST capture of a
# payload digest is written as a full ``response`` record; every later
# capture with the same digest becomes a payload-less ``revisit``
# record whose WARC-Refers-To-Target-URI / WARC-Refers-To-Date point
# at that first capture.  Reference parity: the reference engine's
# file-existence skip (`deepseek_analyzer.py` save path) is the
# single-process analog of this storage-level dedup.

REVISIT_BROADCAST_MAX_DIGESTS = 2_000_000


def prior_from_cdxj(cdx_dir: str):
    """Adapt a previous crawl's CDXJ index into ``revisit_plan``'s
    ``prior`` shape — (payload_digest, url, ts_iso) rows.  This is the
    cross-crawl dedup consultation Common Crawl actually performs:
    the new crawl never re-reads old payloads, only the ~100-byte
    index rows."""
    from cex_crawler_ray.sources.cdx import read_cdxj

    def adapt(batch: pa.Table) -> pa.Table:
        ts14 = batch["ts"].to_pylist()
        iso = [
            f"{t[:4]}-{t[4:6]}-{t[6:8]}T{t[8:10]}:{t[10:12]}:{t[12:14]}Z"
            for t in ts14
        ]
        return pa.table(
            {
                "payload_digest": batch["digest"],
                "url": batch["url"],
                "ts_iso": pa.array(iso, pa.string()),
            }
        )

    return read_cdxj(cdx_dir).map_batches(adapt, batch_format="pyarrow")


def revisit_plan(
    pages,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    broadcast_max_digests: int = REVISIT_BROADCAST_MAX_DIGESTS,
    prior=None,
):
    """Classify each capture as ``response`` (first capture of its
    payload digest, globally, by (ts, url) order) or ``revisit``.

    ``prior`` (optional) is a Dataset of already-archived captures —
    (payload_digest, url, ts_iso) rows, e.g. ``prior_from_cdxj`` over
    the previous crawl's index.  Its rows join the first-capture
    decision as slim partials: a new capture whose digest is already
    stored becomes a revisit POINTING AT THE PRIOR CRAWL's record (no
    response is written this crawl — the payload already lives in the
    older archive), which is exactly Common Crawl's cross-crawl dedup
    contract.

    Scale shape: the first-capture decision runs on SLIM rows only —
    (digest, ts|url sortkey, 1) partials are pre-combined per batch,
    one small groupby finds each digest's first capture and its
    multiplicity, and digests that never repeat are dropped before the
    decision map.  Below ``broadcast_max_digests`` duplicated digests
    the firsts map broadcasts via ``ray.put`` and payloads NEVER move;
    above it, one digest-hash co-partition joins pages with their
    firsts row (payloads move once — the same bytes the sink is about
    to serialize anyway).  Returns the input with four added columns:
    payload_digest, warc_type, refers_url, refers_ts.
    """
    import ray

    from cex_crawler_ray.stages.dedup import (
        _coarse_group_apply,
        _hash64,
    )

    def add_digest(batch: pa.Table) -> pa.Table:
        payloads = batch[payload_col].to_pylist()
        dg = [
            hashlib.sha256(
                p if isinstance(p, bytes) else (p or "").encode("utf-8")
            ).hexdigest()
            for p in payloads
        ]
        return batch.append_column(
            "payload_digest", pa.array(dg, pa.string())
        )

    withd = pages.map_batches(add_digest, batch_format="pyarrow")
    # two consumers (slim aggregate + final decision map): pin the
    # digested dataset so upstream work does not re-execute
    withd = withd.materialize()

    def slim_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        iso = [
            t.strftime("%Y-%m-%dT%H:%M:%SZ")
            for t in batch[ts_col].to_pylist()
        ]
        df = pd.DataFrame(
            {
                "payload_digest": batch["payload_digest"].to_pylist(),
                "sortkey": [
                    i + "|" + u
                    for i, u in zip(iso, batch[url_col].to_pylist())
                ],
            }
        )
        g = df.groupby("payload_digest", as_index=False).agg(
            first_key=("sortkey", "min"), n=("sortkey", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Min, Sum

    slim = withd.map_batches(slim_partial, batch_format="pyarrow")
    if prior is not None:

        def prior_partial(batch: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame(
                {
                    "payload_digest": batch[
                        "payload_digest"
                    ].to_pylist(),
                    "sortkey": [
                        i + "|" + u
                        for i, u in zip(
                            batch["ts_iso"].to_pylist(),
                            batch["url"].to_pylist(),
                        )
                    ],
                }
            )
            g = df.groupby("payload_digest", as_index=False).agg(
                first_key=("sortkey", "min"), n=("sortkey", "size")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        slim = slim.union(
            prior.map_batches(prior_partial, batch_format="pyarrow")
        )

    firsts = (
        slim
        .groupby("payload_digest")
        .aggregate(Min("first_key"), Sum("n"))
        .filter(lambda r: r["sum(n)"] >= 2)
    )
    firsts = firsts.materialize()
    n_dup = firsts.count()

    def _decide(dg_list, key_list, lookup):
        types, r_url, r_ts = [], [], []
        for dg, key in zip(dg_list, key_list):
            first = lookup(dg)
            if first is None or first == key:
                types.append("response")
                r_url.append("")
                r_ts.append("")
            else:
                iso, _, u = first.partition("|")
                types.append("revisit")
                r_url.append(u)
                r_ts.append(iso)
        return types, r_url, r_ts

    if n_dup <= broadcast_max_digests:
        ftbl = pa.concat_tables(
            ray.get(firsts.to_arrow_refs()), promote_options="default"
        )
        dmap_ref = ray.put(
            dict(
                zip(
                    ftbl.column("payload_digest").to_pylist(),
                    ftbl.column("min(first_key)").to_pylist(),
                )
            )
        )

        def mark(batch: pa.Table) -> pa.Table:
            dmap = ray.get(dmap_ref)
            iso = [
                t.strftime("%Y-%m-%dT%H:%M:%SZ")
                for t in batch[ts_col].to_pylist()
            ]
            keys = [
                i + "|" + u
                for i, u in zip(iso, batch[url_col].to_pylist())
            ]
            types, r_url, r_ts = _decide(
                batch["payload_digest"].to_pylist(), keys, dmap.get
            )
            return (
                batch.append_column(
                    "warc_type", pa.array(types, pa.string())
                )
                .append_column("refers_url", pa.array(r_url, pa.string()))
                .append_column("refers_ts", pa.array(r_ts, pa.string()))
            )

        return withd.map_batches(mark, batch_format="pyarrow")

    # co-partition path: tag both streams with a digest hash, pad each
    # side to the union schema (the shuffle needs one schema), shuffle
    # ONCE, merge per partition (pages carry payloads — the bytes the
    # sink serializes next, so this is the last exchange they ride)
    pschema = withd.schema().base_schema
    page_cols = list(pschema.names)
    union_cols = page_cols + ["_first_key", "_kh", "_side"]

    def tag_pages(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column(
            "_first_key", pa.nulls(n, type=pa.string())
        )
        batch = batch.append_column(
            "_kh",
            pa.array(
                [
                    _hash64(d)
                    for d in batch["payload_digest"].to_pylist()
                ],
                pa.uint64(),
            ),
        )
        batch = batch.append_column(
            "_side", pa.array([0] * n, pa.int64())
        )
        return batch.select(union_cols)

    def tag_firsts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for name in page_cols:
            if name == "payload_digest":
                cols[name] = batch["payload_digest"]
            else:
                cols[name] = pa.nulls(n, type=pschema.field(name).type)
        cols["_first_key"] = batch["min(first_key)"]
        cols["_kh"] = pa.array(
            [_hash64(d) for d in batch["payload_digest"].to_pylist()],
            pa.uint64(),
        )
        cols["_side"] = pa.array([1] * n, pa.int64())
        return pa.table({c: cols[c] for c in union_cols})

    pages_t = withd.map_batches(tag_pages, batch_format="pyarrow")
    firsts_t = firsts.map_batches(tag_firsts, batch_format="pyarrow")
    both = pages_t.union(firsts_t)

    def merge(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        pg = df[df["_side"] == 0]
        fr = df[df["_side"] == 1]
        fmap = dict(zip(fr["payload_digest"], fr["_first_key"]))
        iso = [
            t.strftime("%Y-%m-%dT%H:%M:%SZ") for t in pg[ts_col]
        ]
        keys = [i + "|" + u for i, u in zip(iso, pg[url_col])]
        types, r_url, r_ts = _decide(
            list(pg["payload_digest"]), keys, fmap.get
        )
        out = pa.Table.from_pandas(pg[page_cols], preserve_index=False)
        out = out.cast(pschema)
        return (
            out.append_column("warc_type", pa.array(types, pa.string()))
            .append_column("refers_url", pa.array(r_url, pa.string()))
            .append_column("refers_ts", pa.array(r_ts, pa.string()))
        )

    return _coarse_group_apply(both, "_kh", merge, num_parts=64)


def write_warc_deduped(
    ds,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    lang_col: str = "lang",
    payload_col: str = "html",
    compress: str | None = None,
) -> None:
    """Serialize a ``revisit_plan`` output: response rows store their
    payload, revisit rows store headers only (identical-payload-digest
    profile), both carry WARC-Payload-Digest."""
    ds.write_datasink(
        _WarcDatasink(
            out_dir,
            url_col,
            ts_col,
            lang_col,
            payload_col,
            compress=compress,
            type_col="warc_type",
            digest_col="payload_digest",
            refers_url_col="refers_url",
            refers_ts_col="refers_ts",
        )
    )


def resolve_revisits(full_ds):
    """Re-hydrate a revisit-deduped archive: every record comes back
    with its payload — revisit rows receive the payload of the response
    record sharing their digest.  ONE digest-hash co-partition
    co-locates each revisit with its original (response payloads move
    once; revisit rows are slim).  Input is ``read_warc(dir,
    full=True)`` output; returns (url, warc_ts, lang, payload,
    missing_referent).

    A revisit whose digest has NO response row in the input (e.g. a
    crawl-2-only archive produced with ``revisit_plan(prior=...)``
    whose referents live in the prior crawl's archive) is flagged
    ``missing_referent=True`` with an empty payload — never a silent
    empty-bytes substitution; callers union the prior archive in or
    route flagged rows to it."""
    from cex_crawler_ray.stages.dedup import (
        _coarse_group_apply,
        _hash64,
    )

    def tag(batch: pa.Table) -> pa.Table:
        kh = pa.array(
            [_hash64(d) for d in batch["payload_digest"].to_pylist()],
            pa.uint64(),
        )
        return batch.append_column("_kh", kh)

    tagged = full_ds.map_batches(tag, batch_format="pyarrow")

    def hydrate(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        resp = df[df["warc_type"] != "revisit"]
        pmap = dict(zip(resp["payload_digest"], resp["payload"]))
        payloads, missing = [], []
        for d, t, p in zip(
            df["payload_digest"], df["warc_type"], df["payload"]
        ):
            if t != "revisit":
                payloads.append(p)
                missing.append(False)
            elif d in pmap:
                payloads.append(pmap[d])
                missing.append(False)
            else:
                payloads.append(b"")
                missing.append(True)
        return pa.table(
            {
                "url": pa.array(df["url"].to_numpy(object), pa.string()),
                "warc_ts": pa.Array.from_pandas(
                    df["warc_ts"], type=pa.timestamp("us")
                ),
                "lang": pa.array(
                    df["lang"].to_numpy(object), pa.string()
                ),
                "payload": pa.array(payloads, pa.binary()),
                "missing_referent": pa.array(missing, pa.bool_()),
            }
        )

    return _coarse_group_apply(tagged, "_kh", hydrate, num_parts=64)
