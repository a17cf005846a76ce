"""CDXJ URL index over WARC shards (the Common Crawl index layer).

Common Crawl publishes, next to every WARC/WET/WAT crawl segment, a
*CDX index*: one line per archived capture, sorted by SURT key, that
maps a URL to the exact ``(filename, offset, length)`` of its record so
a consumer can range-request and inflate ONE record out of a multi-TB
corpus without scanning anything.  This module adds that layer on top
of ``sources/warc.py``:

* ``surt_key(url)`` / ``surt_key_batch(urls)`` — the Sort-friendly URI
  Reordering Transform: ``https://www.sub.example.com/a?b=2&a=1`` →
  ``com,example,sub)/a?a=1&b=2``.  Host labels reversed and
  comma-joined (so one host's captures — and one registrable domain's
  hosts — are contiguous under a lexicographic sort), scheme and
  leading ``www.`` dropped, default ports dropped, query parameters
  sorted.  The batch form vectorizes the regex split with pandas and
  reverses each distinct host once (per-batch unique hosts ≪ rows).
* ``index_warc_bytes(data, filename)`` — one pass over a ``.warc`` /
  ``.warc.gz`` shard yielding per-record ``(url, ts14, offset, length,
  digest, payload_len)``.  For ``.warc.gz`` the offset/length are the
  COMPRESSED member's byte span (the per-record-member layout written
  by ``write_warc(compress="gzip")`` exists exactly so this index can
  address single members); for plain ``.warc`` they are the record's
  span in the file.
* ``build_cdxj(warc_dir, out_dir)`` — the distributed index build:
  one read task per shard → vectorized SURT keys → a global sort on
  (surt, ts) → worker-written gzip CDXJ shards plus a tiny
  ``cluster.idx`` (first/last SURT per shard), which is Common Crawl's
  published two-level layout (``cdx-NNNNN.gz`` + ``cluster.idx``).
  The sort is the one all-to-all exchange and it moves only index
  rows (~100 bytes/capture), never page payloads.
* ``read_cdxj(out_dir)`` — streaming Dataset over the index shards.
* ``cdx_lookup(out_dir, url)`` — point lookup: binary-search
  ``cluster.idx`` (driver-side, kilobytes), scan only the shard(s)
  whose key range covers the SURT, return the matching entries.
* ``fetch_record(entry, warc_dir)`` — the payoff: seek to
  ``offset``, read ``length`` bytes, inflate the single member, parse
  the single record.  O(record), independent of corpus size.

Digest note: real CC CDX lines carry base32 SHA-1 of the payload; the
correctness oracle here is DuckDB, which exposes ``sha256(VARCHAR)``
but not sha1, so this index stores hex SHA-256 (documented deviation,
same role).

Reference parity note: the reference engine keeps a per-URL *file
existence* check as its only index (``reference`` announcement-JSON
save path); CDXJ is the scale-native form of that lookup for a
Common-Crawl-shaped corpus (BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import bisect
import gzip
import hashlib
import json
import os
import re
import zlib

import pyarrow as pa
from ray.data import Datasink

_GZ_MAGIC = b"\x1f\x8b"
_CRLF = b"\r\n"

# scheme://[userinfo@]host[:port][rest] — host grabbed case-insensitively
_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?:[^/?#@]*@)?"
    r"(?P<host>[^/?#:]*)"
    r"(?::(?P<port>\d+))?"
    r"(?P<rest>[/?#].*)?$"
)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _reverse_host(host: str) -> str:
    host = host.lower().rstrip(".")
    if host.startswith("www."):
        host = host[4:]
    return ",".join(reversed(host.split(".")))


def _sort_query(rest: str) -> str:
    """Sort query parameters; fragments are capture-identity-irrelevant
    and dropped (CDX convention)."""
    rest = rest.split("#", 1)[0]
    if "?" not in rest:
        return rest
    path, _, q = rest.partition("?")
    if not q:
        return path
    return path + "?" + "&".join(sorted(q.split("&")))


def _escape_key(key: str) -> str:
    """CDXJ lines are space-delimited, so the key itself must never
    contain whitespace: percent-encode the characters that would break
    the line framing (real SURT canonicalization likewise
    percent-encodes).  Idempotent for already-clean keys."""
    return (
        key.replace("%", "%25")
        .replace(" ", "%20")
        .replace("\t", "%09")
        .replace("\n", "%0A")
        .replace("\r", "%0D")
    )


def surt_key(url: str) -> str:
    """Scalar SURT.  Non-URL strings key as themselves lowercased (so
    the sort stays total on dirty input rather than raising);
    whitespace is percent-encoded so the key can never break the
    space-delimited CDXJ line framing."""
    m = _URL_RE.match(url)
    if not m:
        return _escape_key(url.lower())
    scheme = m.group("scheme").lower()
    host = _reverse_host(m.group("host"))
    port = m.group("port")
    if port and port != _DEFAULT_PORTS.get(scheme):
        host += ":" + port
    rest = _sort_query(m.group("rest") or "/")
    if not rest.startswith("/"):
        rest = "/" + rest
    return _escape_key(host + ")" + rest)


def surt_key_batch(urls: list[str]) -> list[str]:
    """Vectorized SURT: one pandas regex extract over the batch, one
    host reversal per DISTINCT host (unique hosts ≪ rows on web data),
    Python fallback only for rows with a port / query / fragment (the
    minority on crawl frontiers)."""
    import pandas as pd

    s = pd.Series(urls, dtype="object")
    parts = s.str.extract(
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?"
        r"(?P<host>[^/?#:]*)(?P<port>:\d+)?(?P<rest>[/?#].*)?$"
    )
    fast = (
        parts["scheme"].notna()
        & parts["port"].isna()
        & ~s.str.contains(r"[?#%\s]", regex=True, na=True)
    )
    out = [None] * len(urls)
    if fast.any():
        hosts = parts.loc[fast, "host"]
        rev = {h: _reverse_host(h) for h in hosts.unique()}
        rests = parts.loc[fast, "rest"].fillna("/")
        keyed = hosts.map(rev) + ")" + rests
        for i, k in zip(keyed.index, keyed.to_numpy()):
            out[i] = k
    for i in (~fast).to_numpy().nonzero()[0]:
        out[i] = surt_key(urls[i])
    return out


def _record_fields(rec: bytes) -> tuple[str, str, int, int]:
    """(url, ts14, payload_len, head_end) from one decompressed WARC
    record — the single header parser every CDX consumer shares (the
    payload spans ``rec[head_end+4 : head_end+4+payload_len]``)."""
    head_end = rec.find(_CRLF + _CRLF)
    head = rec[:head_end].decode("utf-8", "replace")
    url, ts, clen = "", "", 0
    for line in head.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        k = k.strip().lower()
        if k == "warc-target-uri":
            url = v.strip()
        elif k == "warc-date":
            ts = v.strip()
        elif k == "content-length":
            clen = int(v.strip())
    ts14 = re.sub(r"[^0-9]", "", ts)[:14]
    return url, ts14, clen, head_end


def index_warc_bytes(data: bytes, filename: str) -> dict:
    """One pass over a shard → parallel index-column lists.  Offsets
    address the stored bytes (compressed member span for .gz), which is
    what ``fetch_record`` seeks to."""
    cols = {
        "url": [],
        "ts": [],
        "offset": [],
        "length": [],
        "digest": [],
        "payload_len": [],
        "filename": [],
    }

    def emit(rec: bytes, off: int, ln: int) -> None:
        url, ts14, clen, head_end = _record_fields(rec)
        payload = rec[head_end + 4 : head_end + 4 + clen]
        cols["url"].append(url)
        cols["ts"].append(ts14)
        cols["offset"].append(off)
        cols["length"].append(ln)
        cols["digest"].append(hashlib.sha256(payload).hexdigest())
        cols["payload_len"].append(clen)
        cols["filename"].append(filename)

    if data[:2] == _GZ_MAGIC:
        # memoryview: slicing the remaining tail per member must be
        # zero-copy, or the scan is O(records x shard bytes) in memcpy
        mv = memoryview(data)
        pos, n = 0, len(data)
        while pos < n and data[pos : pos + 2] == _GZ_MAGIC:
            d = zlib.decompressobj(wbits=31)
            rec = d.decompress(mv[pos:])
            member_len = (n - pos) - len(d.unused_data)
            emit(rec, pos, member_len)
            pos += member_len
    else:
        pos, n = 0, len(data)
        while pos < n:
            head_end = data.find(_CRLF + _CRLF, pos)
            if head_end < 0:
                break
            # Content-Length bounds the record: header + blank + payload
            # + record separator
            head = data[pos:head_end].decode("utf-8", "replace")
            clen = 0
            for line in head.split("\r\n"):
                if line.lower().startswith("content-length:"):
                    clen = int(line.partition(":")[2].strip())
            end = head_end + 4 + clen + 4
            emit(data[pos:end], pos, end - pos)
            pos = end
    return cols


class _CdxjDatasink(Datasink):
    """Worker-written gzip CDXJ shards + per-shard key-range sidecars.
    The upstream global sort range-partitions rows, so shard key ranges
    are disjoint (up to a duplicate key spanning a boundary — lookup
    scans every shard whose [first, last] covers the key).  Names carry
    task/block ordinals then a content hash: idempotent under task
    re-execution, no collapse of identical blocks (same contract as
    ``_WarcDatasink``)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def on_write_start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)

    def write(self, blocks, ctx) -> int:
        written = 0
        for i, block in enumerate(blocks):
            t = pa.table(block) if not isinstance(block, pa.Table) else block
            if t.num_rows == 0:
                continue
            surts = t["surt"].to_pylist()
            tss = t["ts"].to_pylist()
            lines = []
            meta_cols = (
                "url",
                "digest",
                "length",
                "offset",
                "filename",
                "payload_len",
            )
            metas = {c: t[c].to_pylist() for c in meta_cols}
            for r in range(t.num_rows):
                obj = {c: metas[c][r] for c in meta_cols}
                lines.append(
                    f"{surts[r]} {tss[r]} "
                    + json.dumps(obj, separators=(",", ":"), sort_keys=True)
                )
            data = gzip.compress(
                ("\n".join(lines) + "\n").encode("utf-8"), mtime=0
            )
            digest = hashlib.sha256(data).hexdigest()[:16]
            name = f"cdx-{ctx.task_idx:05d}-{i:03d}-{digest}.gz"
            path = os.path.join(self.out_dir, name)
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            meta = {
                "name": name,
                "first": surts[0],
                "last": surts[-1],
                "n": t.num_rows,
            }
            mtmp = path + f".meta.tmp-{os.getpid()}"
            with open(mtmp, "w") as f:
                json.dump(meta, f)
            os.replace(mtmp, path + ".meta")
            written += t.num_rows
        return written


def _write_cluster_idx(out_dir: str) -> None:
    """Fold the per-shard sidecars into ``cluster.idx`` (one line per
    shard: first-SURT, last-SURT, shard name, row count — kilobytes for
    millions of captures), then drop the sidecars.  This is the
    driver-side O(shards) step of the two-level index."""
    metas = []
    for fn in os.listdir(out_dir):
        if fn.endswith(".meta"):
            with open(os.path.join(out_dir, fn)) as f:
                metas.append(json.load(f))
    metas.sort(key=lambda m: (m["first"], m["name"]))
    tmp = os.path.join(out_dir, f"cluster.idx.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        for m in metas:
            f.write(f"{m['first']}\t{m['last']}\t{m['name']}\t{m['n']}\n")
    os.replace(tmp, os.path.join(out_dir, "cluster.idx"))
    for fn in os.listdir(out_dir):
        if fn.endswith(".meta"):
            os.remove(os.path.join(out_dir, fn))


def build_cdxj(warc_dir: str, out_dir: str):
    """Distributed CDXJ build over a WARC shard directory.  One read
    task per shard (payload bytes never leave the scan task — only
    ~100-byte index rows continue), SURT keys vectorized per batch, ONE
    global (surt, ts) sort, worker-written sorted shards, then the tiny
    cluster.idx fold on the driver."""
    import ray

    # The index addresses ON-DISK bytes, so the scan must see the raw
    # shard.  ray.data.read_binary_files auto-inflates by the .gz
    # extension (its compression=None arg means "detect", not "raw"),
    # which would shift every offset — so shard paths fan out as rows
    # and each scan task opens its file raw.  Same one-task-per-shard
    # parallelism; a shared filesystem serves the open on a cluster.
    # response shards ONLY: exact-suffix match excludes torn .tmp-*
    # leftovers from crashed writers and co-located .warc.wet /
    # .warc.wat companion shards (whose records are conversions /
    # metadata, not captures)
    paths = sorted(
        os.path.join(warc_dir, fn)
        for fn in os.listdir(warc_dir)
        if fn.endswith((".warc", ".warc.gz"))
    )
    # a rebuild REPLACES the index: purge any previous cdx shards so
    # read_cdxj (which globs *.gz) and cluster.idx can't disagree about
    # which generation is current
    if os.path.isdir(out_dir):
        for fn in os.listdir(out_dir):
            if fn.startswith("cdx-") or fn == "cluster.idx":
                os.remove(os.path.join(out_dir, fn))
    files = ray.data.from_items([{"path": p} for p in paths])

    def index_batch(batch: pa.Table) -> pa.Table:
        out = None
        for path in batch["path"].to_pylist():
            with open(path, "rb") as f:
                data = f.read()
            cols = index_warc_bytes(data, os.path.basename(path))
            if out is None:
                out = cols
            else:
                for k in out:
                    out[k].extend(cols[k])
        if out is None:
            out = {
                k: []
                for k in (
                    "url",
                    "ts",
                    "offset",
                    "length",
                    "digest",
                    "payload_len",
                    "filename",
                )
            }
        return pa.table(
            {
                "surt": pa.array(surt_key_batch(out["url"]), pa.string()),
                "ts": pa.array(out["ts"], pa.string()),
                "url": pa.array(out["url"], pa.string()),
                "offset": pa.array(out["offset"], pa.int64()),
                "length": pa.array(out["length"], pa.int64()),
                "digest": pa.array(out["digest"], pa.string()),
                "payload_len": pa.array(out["payload_len"], pa.int64()),
                "filename": pa.array(out["filename"], pa.string()),
            }
        )

    idx = files.map_batches(index_batch, batch_format="pyarrow")
    idx.sort(["surt", "ts"]).write_datasink(_CdxjDatasink(out_dir))
    _write_cluster_idx(out_dir)


def _parse_cdxj_lines(text: str) -> dict:
    cols = {
        "surt": [],
        "ts": [],
        "url": [],
        "offset": [],
        "length": [],
        "digest": [],
        "payload_len": [],
        "filename": [],
    }
    for line in text.splitlines():
        if not line:
            continue
        surt, ts, blob = line.split(" ", 2)
        obj = json.loads(blob)
        cols["surt"].append(surt)
        cols["ts"].append(ts)
        for k in ("url", "offset", "length", "digest", "payload_len", "filename"):
            cols[k].append(obj[k])
    return cols


def read_cdxj(out_dir: str):
    """Streaming Dataset over the index shards (one task per shard;
    cluster.idx is excluded by extension)."""
    import ray

    files = ray.data.read_binary_files(out_dir, file_extensions=["gz"])

    def parse(batch: pa.Table) -> pa.Table:
        out = None
        for data in batch["bytes"].to_pylist():
            # ray.data.read_binary_files auto-inflates by .gz extension;
            # sniff the magic so raw bytes handed in directly also work
            if data[:2] == _GZ_MAGIC:
                data = gzip.decompress(data)
            cols = _parse_cdxj_lines(data.decode("utf-8"))
            if out is None:
                out = cols
            else:
                for k in out:
                    out[k].extend(cols[k])
        if out is None:
            out = _parse_cdxj_lines("")
        return pa.table(
            {
                "surt": pa.array(out["surt"], pa.string()),
                "ts": pa.array(out["ts"], pa.string()),
                "url": pa.array(out["url"], pa.string()),
                "offset": pa.array(out["offset"], pa.int64()),
                "length": pa.array(out["length"], pa.int64()),
                "digest": pa.array(out["digest"], pa.string()),
                "payload_len": pa.array(out["payload_len"], pa.int64()),
                "filename": pa.array(out["filename"], pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")


def _load_cluster_idx(out_dir: str) -> list[tuple[str, str, str, int]]:
    rows = []
    with open(os.path.join(out_dir, "cluster.idx")) as f:
        for line in f:
            first, last, name, n = line.rstrip("\n").split("\t")
            rows.append((first, last, name, int(n)))
    return rows


def cdx_lookup(out_dir: str, url: str) -> list[dict]:
    """Point lookup: SURT the url, bisect cluster.idx for candidate
    shards (a duplicate key can span a range boundary, so every shard
    whose [first, last] covers the key is scanned), scan only those.
    Driver-side O(log shards + shard rows) — the corpus itself is never
    touched."""
    key = surt_key(url)
    shards = _load_cluster_idx(out_dir)
    firsts = [s[0] for s in shards]
    # rightmost shard whose first <= key, plus any earlier shard whose
    # last still reaches the key
    hi = bisect.bisect_right(firsts, key)
    hits = []
    for first, last, name, _n in shards[:hi]:
        if last < key:
            continue
        with open(os.path.join(out_dir, name), "rb") as f:
            cols = _parse_cdxj_lines(
                gzip.decompress(f.read()).decode("utf-8")
            )
        for i, s in enumerate(cols["surt"]):
            if s == key:
                hits.append({k: cols[k][i] for k in cols})
    hits.sort(key=lambda h: h["ts"])
    return hits


def fetch_record(entry: dict, warc_dir: str) -> dict:
    """Random access: seek to entry['offset'], read entry['length']
    bytes, inflate the single gzip member if compressed, parse the one
    record.  O(record) regardless of corpus size — the contract the
    per-record-member .warc.gz layout exists for."""
    from cex_crawler_ray.sources.warc import parse_warc_bytes

    path = os.path.join(warc_dir, entry["filename"])
    with open(path, "rb") as f:
        f.seek(entry["offset"])
        data = f.read(entry["length"])
    if data[:2] == _GZ_MAGIC:
        data = gzip.decompress(data)
    rec = parse_warc_bytes(data)
    return {k: v[0] for k, v in rec.items()}


def cdx_diff(dir_a: str, dir_b: str, num_parts: int = 64):
    """Snapshot diff of two CDXJ indexes — the incremental-recrawl
    driver: compare crawl A's index against crawl B's BY DIGEST and
    classify every capture identity as ``same`` / ``changed`` /
    ``added`` / ``removed``.  This is the cheap form of change
    detection a recrawler runs between crawls (feeding
    ``recrawl_priority``'s observation log): index rows are ~100
    bytes, so diffing two 100-TB crawls moves only their indexes,
    never page payloads.

    Identity is the SURT KEY, not the raw url — http/https/www/query-
    order variants of one page deliberately collapse to one row (the
    CDX canonicalization contract); the reported ``url`` is the latest
    capture's spelling (B side when present).

    Plan: both indexes stream in (one task per shard), rows tag their
    side, ONE coarse SURT-hash partition co-locates each URL's rows
    from both snapshots, and a vectorized pandas outer merge per
    partition classifies (latest capture per side wins when a snapshot
    holds multiple).  Output: (url, change) rows.
    """
    from cex_crawler_ray.stages.dedup import _coarse_group_apply, _hash64

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            surts = batch["surt"].to_pylist()
            n = len(surts)
            return pa.table(
                {
                    "khash": pa.array(
                        [_hash64(s) for s in surts], pa.uint64()
                    ),
                    "surt": batch["surt"],
                    "url": batch["url"],
                    "ts": batch["ts"],
                    "digest": batch["digest"],
                    "side": pa.array([side] * n, pa.int64()),
                }
            )

        return f

    import ray

    u = (
        read_cdxj(dir_a)
        .map_batches(tag(0), batch_format="pyarrow")
        .union(read_cdxj(dir_b).map_batches(tag(1), batch_format="pyarrow"))
    )

    def classify(part: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        df = part.to_pandas().sort_values(["surt", "side", "ts"])
        latest = df.groupby(["surt", "side"], as_index=False).tail(1)
        a = latest[latest["side"] == 0][["surt", "url", "digest"]]
        b = latest[latest["side"] == 1][["surt", "url", "digest"]]
        m = a.merge(b, on="surt", how="outer", suffixes=("_a", "_b"))
        in_a = m["url_a"].notna().to_numpy()
        in_b = m["url_b"].notna().to_numpy()
        same = in_a & in_b & (m["digest_a"] == m["digest_b"]).to_numpy()
        change = np.select(
            [same, in_a & in_b, in_b],
            ["same", "changed", "added"],
            default="removed",
        )
        url = np.where(in_b, m["url_b"].to_numpy(), m["url_a"].to_numpy())
        return pa.table(
            {
                "url": pa.array(url.astype(object), pa.string()),
                "change": pa.array(change.astype(object), pa.string()),
            }
        )

    return _coarse_group_apply(u, "khash", classify, num_parts)


def cdx_bulk_lookup(cdx_dir: str, urls_ds, num_parts: int = 64):
    """Distributed point-lookup: resolve a DATASET of urls against the
    index — the scale path when the query side is millions of urls
    (the driver-side ``cdx_lookup`` binary search is for ones).  Query
    urls SURT in their batches; ONE surt-hash co-partition co-locates
    each query with its index rows (both sides carry ~100-byte rows);
    unmatched urls drop (archive misses).  Returns (url, ts, filename,
    offset, length, digest, payload_len) — one row per matching
    capture.
    """
    from cex_crawler_ray.stages.dedup import _coarse_group_apply, _hash64

    def tag_query(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        surts = surt_key_batch(urls)
        return pa.table(
            {
                "khash": pa.array(
                    [_hash64(s) for s in surts], pa.uint64()
                ),
                "surt": pa.array(surts, pa.string()),
                "url": pa.array(urls, pa.string()),
                "side": pa.array([0] * len(urls), pa.int64()),
            }
        )

    def tag_index(batch: pa.Table) -> pa.Table:
        surts = batch["surt"].to_pylist()
        n = len(surts)
        return pa.table(
            {
                "khash": pa.array(
                    [_hash64(s) for s in surts], pa.uint64()
                ),
                "surt": batch["surt"],
                "url": batch["url"],
                "side": pa.array([1] * n, pa.int64()),
                "ts": batch["ts"],
                "filename": batch["filename"],
                "offset": batch["offset"],
                "length": batch["length"],
                "digest": batch["digest"],
                "payload_len": batch["payload_len"],
            }
        )

    import ray

    q = urls_ds.map_batches(tag_query, batch_format="pyarrow")
    idx = read_cdxj(cdx_dir).map_batches(tag_index, batch_format="pyarrow")

    def resolve(part: pa.Table) -> pa.Table:
        import numpy as np

        df = part.to_pandas()
        qs = df[df["side"] == 0][["surt", "url"]]
        ix = df[df["side"] == 1].drop(columns=["khash", "side", "url"])
        m = qs.merge(ix, on="surt", how="inner")
        return pa.table(
            {
                "url": pa.array(m["url"].to_numpy(object), pa.string()),
                "ts": pa.array(m["ts"].to_numpy(object), pa.string()),
                "filename": pa.array(
                    m["filename"].to_numpy(object), pa.string()
                ),
                "offset": pa.array(
                    m["offset"].to_numpy(np.int64), pa.int64()
                ),
                "length": pa.array(
                    m["length"].to_numpy(np.int64), pa.int64()
                ),
                "digest": pa.array(
                    m["digest"].to_numpy(object), pa.string()
                ),
                "payload_len": pa.array(
                    m["payload_len"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    # the union's two sides have different schemas; pad the query side
    # with nulls via concat-with-promote inside the partition instead:
    # union requires matching columns, so pad here
    def pad_query(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nulls_s = pa.array([None] * n, pa.string())
        nulls_i = pa.array([None] * n, pa.int64())
        return pa.table(
            {
                "khash": batch["khash"],
                "surt": batch["surt"],
                "url": batch["url"],
                "side": batch["side"],
                "ts": nulls_s,
                "filename": nulls_s,
                "offset": nulls_i,
                "length": nulls_i,
                "digest": nulls_s,
                "payload_len": nulls_i,
            }
        )

    u = q.map_batches(pad_query, batch_format="pyarrow").union(idx)
    return _coarse_group_apply(u, "khash", resolve, num_parts)


def fetch_resolved(entries_ds, warc_dir: str):
    """Archive-backed selective fetch: read each resolved entry's
    record by (filename, offset, length) — grouped by filename inside
    every batch so one shard opens once per batch, each member
    inflated independently (the .warc.gz per-record-member contract).
    Work per task is O(bytes fetched), independent of archive size.
    Returns (url, payload) rows.
    """

    def fetch_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().sort_values(["filename", "offset"])
        urls, payloads = [], []
        for fn, grp in df.groupby("filename", sort=False):
            path = os.path.join(warc_dir, fn)
            with open(path, "rb") as f:
                for url, off, ln in zip(
                    grp["url"], grp["offset"], grp["length"]
                ):
                    f.seek(int(off))
                    data = f.read(int(ln))
                    if data[:2] == _GZ_MAGIC:
                        data = gzip.decompress(data)
                    _u, _t, clen, head_end = _record_fields(data)
                    urls.append(url)
                    payloads.append(
                        data[head_end + 4 : head_end + 4 + clen]
                    )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return entries_ds.map_batches(fetch_batch, batch_format="pyarrow")


def cdx_prefix_scan(cdx_dir: str, surt_prefix: str, num_parts: int = 16):
    """Range scan: every capture whose SURT starts with
    ``surt_prefix`` — the domain/path query shape of the public CC
    index (``com,example)/*``).  The two-level layout makes this
    cheap: cluster.idx (driver-side, kilobytes) bounds the shard set
    to those whose [first, last] range intersects the prefix
    interval, and ONLY those shards are scanned — one task per
    candidate shard, the rest of a 100-TB index untouched.  Returns
    the index-row Dataset filtered to the prefix.
    """
    import ray

    lo = surt_prefix
    hi = surt_prefix + "\x7f"  # past any printable continuation
    shards = [
        name
        for first, last, name, _n in _load_cluster_idx(cdx_dir)
        if not (last < lo or first >= hi)
    ]
    files = ray.data.from_items(
        [{"path": os.path.join(cdx_dir, name)} for name in shards]
    )

    def scan(batch: pa.Table) -> pa.Table:
        out = None
        for path in batch["path"].to_pylist():
            with open(path, "rb") as f:
                data = f.read()
            if data[:2] == _GZ_MAGIC:
                data = gzip.decompress(data)
            cols = _parse_cdxj_lines(data.decode("utf-8"))
            keep = [
                i
                for i, s in enumerate(cols["surt"])
                if s.startswith(surt_prefix)
            ]
            sub = {k: [v[i] for i in keep] for k, v in cols.items()}
            if out is None:
                out = sub
            else:
                for k in out:
                    out[k].extend(sub[k])
        if out is None:
            out = _parse_cdxj_lines("")
        return pa.table(
            {
                "surt": pa.array(out["surt"], pa.string()),
                "ts": pa.array(out["ts"], pa.string()),
                "url": pa.array(out["url"], pa.string()),
                "offset": pa.array(out["offset"], pa.int64()),
                "length": pa.array(out["length"], pa.int64()),
                "digest": pa.array(out["digest"], pa.string()),
                "payload_len": pa.array(out["payload_len"], pa.int64()),
                "filename": pa.array(out["filename"], pa.string()),
            }
        )

    return files.map_batches(scan, batch_format="pyarrow")
