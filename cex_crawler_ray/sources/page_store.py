"""Bucketed Parquet page store + the fetch stage (simulated internet).

In production the fetch stage is an HTTP actor pool; in this sandbox
"fetching" a url means resolving it against a Common-Crawl-style
``pages`` Parquet table (BASELINE.json ``input_hint``).  At 100 TB that
resolution is a *hash join*, and an all-to-all shuffle of page HTML per
crawl round would be the dominant cost — so the store is written
**pre-bucketed by url-hash** once, and each fetch round only shuffles
the (tiny) frontier rows to their bucket, then joins inside the bucket:

* ``write``: pages -> add ``bucket = url_hash % B`` -> hive-partitioned
  Parquet (``bucket=k/``).  One directory per bucket also gives the
  resumable-output property (a failed write re-runs one bucket).
* ``fetch``: frontier -> same bucket key -> ``groupby(bucket)`` (the
  only shuffle, over frontier metadata ~100 B/row, never HTML) ->
  ``map_groups`` does a per-bucket Arrow join against that bucket's
  files, reading only the columns asked for.

The reference's analog is Playwright ``page.goto`` + ``page.content()``
per url (reference ``exchange/base_scraper.py:78-143``); statuses mirror
HTTP reality: 200 hit, 404 miss (url not in the store).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.canonical import url_hash64

FETCH_COLS = ["url", "warc_ts", "html"]


def _bucket_of_urls(urls, num_buckets: int) -> np.ndarray:
    return np.fromiter(
        (url_hash64(u) % num_buckets for u in urls),
        dtype=np.int64,
        count=len(urls),
    )


class PageStore:
    def __init__(self, path: str, num_buckets: int = 16):
        self.path = path
        self.num_buckets = num_buckets

    def write(self, pages: "ray.data.Dataset") -> None:
        nb = self.num_buckets

        def add_bucket(batch: pa.Table) -> pa.Table:
            b = _bucket_of_urls(batch["url"].to_pylist(), nb)
            return batch.append_column("bucket", pa.array(b, pa.int64()))

        pages.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
            self.path, partition_cols=["bucket"]
        )

    def fetch(
        self,
        frontier: "ray.data.Dataset",
        concurrency: int | tuple | None = None,
        batch_size: int = 4096,
    ) -> "ray.data.Dataset":
        """Left-join frontier urls against the store.

        Output = frontier columns + ``status``(200/404), ``warc_ts``,
        ``html``.  No shuffle: each ``map_batches`` task resolves its
        batch against the bucket files it needs, through a
        worker-process-global LRU of bucket indexes (Ray reuses worker
        processes, so hot buckets stay resident across tasks AND crawl
        rounds — the reference's per-process browser/buildId cache
        pattern, ``exchange/gate.py:52``, without per-round actor-pool
        startup).  Sorting the frontier by bucket first (the caller
        does; it is materialized at round boundaries anyway) keeps each
        task on a contiguous bucket range, so the cluster collectively
        holds each bucket ~once.
        """
        path, nb = self.path, self.num_buckets

        def fetch_fn(batch: pa.Table) -> pa.Table:
            return _fetch_batch(batch, path, nb)

        kwargs = {}
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
        return frontier.map_batches(
            fetch_fn,
            batch_format="pyarrow",
            batch_size=batch_size,
            **kwargs,
        )

    def bucket_keys(self, urls) -> np.ndarray:
        return _bucket_of_urls(urls, self.num_buckets)


# Worker-process-global bucket cache: (store_path, bucket) -> (url->row
# index, table).  Ray worker processes are reused across tasks, so this
# amortizes bucket loads exactly like per-actor state would, with no
# actor-pool startup cost.  Bounded LRU so large stores can't blow the
# worker heap (each entry is one bucket's pages).
_BUCKET_CACHE: "OrderedDict" = None
_BUCKET_CACHE_CAP = 64


def _bucket_entry(path: str, b: int):
    global _BUCKET_CACHE
    from collections import OrderedDict

    import pyarrow.parquet as pq

    if _BUCKET_CACHE is None:
        _BUCKET_CACHE = OrderedDict()
    key = (path, b)
    hit = _BUCKET_CACHE.get(key)
    if hit is not None:
        _BUCKET_CACHE.move_to_end(key)
        return hit
    try:
        t = pq.read_table(f"{path}/bucket={b}", columns=FETCH_COLS)
    except FileNotFoundError:
        t = pa.table(
            {
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us", tz="UTC")),
                "html": pa.array([], pa.binary()),
            }
        )
    index = {u: i for i, u in enumerate(t["url"].to_pylist())}
    entry = (index, t.combine_chunks())
    _BUCKET_CACHE[key] = entry
    while len(_BUCKET_CACHE) > _BUCKET_CACHE_CAP:
        _BUCKET_CACHE.popitem(last=False)
    return entry


def _fetch_batch(batch: pa.Table, path: str, num_buckets: int) -> pa.Table:
    urls = batch["url"].to_pylist()
    n = len(urls)
    buckets = _bucket_of_urls(urls, num_buckets)
    ts_out = np.full(n, -1, dtype=np.int64)
    html_out: list = [None] * n
    found = np.zeros(n, dtype=bool)
    for b in np.unique(buckets):
        index, t = _bucket_entry(path, int(b))
        ts_col = t["warc_ts"]
        html_col = t["html"]
        for i in np.nonzero(buckets == b)[0]:
            j = index.get(urls[i])
            if j is not None:
                found[i] = True
                ts_out[i] = ts_col[j].value
                html_out[i] = html_col[j].as_py()
    status = pa.array(np.where(found, 200, 404).astype(np.int32), pa.int32())
    warc = pa.array(
        [int(v) if f else None for v, f in zip(ts_out, found)],
        pa.timestamp("us", tz="UTC"),
    )
    out = batch.append_column("status", status)
    out = out.append_column("warc_ts", warc)
    return out.append_column("html", pa.array(html_out, pa.binary()))
