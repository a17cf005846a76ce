"""The crawl engine: URL frontier + politeness + fetch + extract + discover.

Ray-Data-native redesign of the reference's per-exchange sequential
loops (reference ``main.py:148-186`` fans out 14 OS processes, each
running one announcement at a time with random sleeps).  Here a crawl is
a sequence of *rounds*; each round is a streaming Dataset pipeline:

    frontier ──robots──schedule(groupby host)──fetch(bucket join)──┐
        ▲                                                          │
        └── deferred ∪ (discover links → canonicalize → seen) ◄────┘
                                            │
                                    extract (map_batches)

* the frontier is a Dataset of ~100-byte rows (never HTML),
* the URL-seen filter is the sharded actor pool (state/seen_filter.py),
  probed *inside* ``map_batches`` tasks — admission is atomic and
  idempotent, so Ray task re-execution cannot double-fetch,
* politeness is a deterministic per-host token budget per round
  (state/politeness.py) applied by a ``groupby(host).map_groups``
  schedule: rows sorted by ``(priority, discovered_ts, url_hash)`` get
  slots; slots beyond the budget defer to the next round.  This makes
  the crawl order a pure function of (seeds, pages, budget) — the
  north_rule's reproducible-ordering requirement,
* with a checkpoint dir, each round's pages are written BY THE WORKERS
  to kind-partitioned Parquet (driver never materializes page data) plus
  the pending frontier, seen-filter snapshots and an atomic manifest —
  a killed crawl resumes at the next round without re-fetching
  (reference analog: the ``os.path.exists`` skip,
  ``exchange/binance.py:253-255``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.canonical import (
    canonicalize,
    host_of,
    url_hash64,
    url_hash64_arrow,
)
from ..schemas import FRONTIER
from ..sources.page_store import PageStore
from ..state.politeness import RobotsPolicy
from ..state.seen_filter import SeenFilterPool
from ..stages.extract import ExtractStage


@dataclass
class CrawlConfig:
    max_rounds: int = 10
    max_depth: int = 8
    round_ms: int = 10_000  # politeness round length (token budget basis)
    seen_shards: int = 4
    seen_mode: str = "exact"
    as_of_hk: str | None = None  # deterministic 'now' for the recency window
    offset_days: int = 7
    profiles: dict = field(default_factory=dict)
    fetch_concurrency: int | None = None
    # frontier rows above which a checkpointed crawl round runs the
    # fully-distributed path (robots + schedule in workers, frontier
    # never materialized on the driver); None -> module default
    driver_schedule_max_rows: int | None = None
    # alternative fetch stage: callable(to_fetch: pa.Table) -> Dataset
    # with (frontier + status + warc_ts + html) columns.  None -> the
    # store's bucket-aligned batch fetch; the live actor-pool fetcher
    # (sources/live_fetch.py) plugs in here.
    fetch_fn: object | None = None
    # M12 title filters (reference exchange/lbank.py:179-184 'Delist'
    # substring keep, exchange/bithumb.py:90-95 category whitelist):
    # host -> tuple of substrings; a discovered link on that host is
    # admitted only if its anchor title contains one of them.  Applied
    # vectorized between discover and seen-check, in the workers.
    title_filters: dict = field(default_factory=dict)
    # GC consumed frontier generations (deferred dirs, frontier_next
    # files, stale seed/reseed files) right after each round's manifest
    # commit, so a long crawl's checkpoint holds ONE frontier
    # generation instead of Σ rounds' worth.  The manifest-named paths
    # are always kept, so crash-resume is unaffected.
    auto_compact: bool = True
    # AIMD adaptive politeness (state/politeness.AdaptiveDelay): when
    # set, each round's per-host (ok, throttled) outcome counts update
    # the host's delay multiplier, and next round's token budget uses
    # the effective delay.  Deterministic fold over statuses — crawl
    # ordering stays reproducible.  None -> static robots budgets.
    adaptive: object | None = None
    # Rank-aware round capacity: when a cluster's total fetch capacity
    # per round is smaller than Σ per-host politeness budgets, cap the
    # round at ``round_fetch_cap`` fetches, allocated to hosts by
    # descending ``host_ranks`` score (e.g. PageRank over the host link
    # graph — ``rank_hosts``); ties fall back to the deterministic
    # (priority, discovered_ts, url_hash) slot order.  Capped-out rows
    # are DEFERRED, not dropped — they re-enter the next round's
    # frontier like any politeness-deferred row.  None -> uncapped
    # (default, golden-tested behavior unchanged).  On the distributed
    # path the cut runs as per-host slot quotas computed from the
    # scheduled slice's metadata columns (exact — see ``_cap_quotas``),
    # with losers worker-written to the deferred dir.
    round_fetch_cap: int | None = None
    host_ranks: dict = field(default_factory=dict)
    # Profile-aware link discovery: callable(url, doc) -> [(href,
    # title), ...] replacing the generic ``links_from_page`` scan —
    # the hook real-site profile packs use to map list-API items to
    # announcement urls by their id/url rules
    # (``profiles.real_exchanges.real_links_fn``).  None -> generic.
    links_fn: object | None = None


# A url matching this is PROVABLY a fixed point of ``canonicalize``:
# lowercase scheme, lowercase host without port/userinfo, a path that
# is '/' or '/'-joined non-empty segments with no trailing slash, an
# optional non-empty query, no fragment — reconstruction is the input
# string, so the Python normalizer can be skipped (the dominant
# frontier-admission cost after hashing).  Anything else (relative,
# uppercase, ports, fragments, '//', bare host, trailing '?') takes
# the slow path.  Tab/CR/LF/space are excluded from every class:
# urlsplit strips those control chars before parsing, so a URL
# containing them canonicalizes differently from its raw form and
# must not take the fast path (it would get a distinct url_hash64).
_CANONICAL_FAST_RE = (
    r"^(?P<s>https?)://(?P<h>[a-z0-9._\-]+)"
    r"(?:/|(?:/[^/?#\t\r\n ]+)+)(?:\?[^#\t\r\n ]+)?$"
)


def canonicalize_batch(batch: pa.Table, depth: int = 0, round_no: int = 0) -> pa.Table:
    """urls (+optional title/priority) -> FRONTIER-schema rows.

    The frontier hot path: batches whose every url matches the
    canonical-fixed-point regex stay Arrow end to end (regex extract,
    vectorized hash, zero-copy url column) — no ``to_pylist`` and no
    per-row Python.  Only rows that FAIL the regex take the Python
    ``canonicalize`` normalizer, and only those rows are rebuilt."""
    url_col = batch["url"].combine_chunks() if isinstance(
        batch["url"], pa.ChunkedArray
    ) else batch["url"]
    n = len(url_col)
    extracted = pc.extract_regex(url_col, _CANONICAL_FAST_RE)
    # null struct = no match (.field() of a null struct yields "", so
    # gate on struct validity, not the field value)
    valid = extracted.is_valid() if n else pa.array([], pa.bool_())
    n_fast = pc.sum(valid).as_py() or 0
    if n_fast == n:
        c_url_arr = url_col
        c_host_arr = (
            extracted.field("h") if n else pa.array([], pa.string())
        )
    else:
        fast = valid.to_numpy(zero_copy_only=False)
        urls = url_col.to_pylist()
        fast_hosts = extracted.field("h").to_pylist()
        c_url = urls
        c_host = fast_hosts
        for i in np.flatnonzero(~fast):
            cu = canonicalize(urls[i])
            c_url[i] = cu
            c_host[i] = host_of(cu)
        c_url_arr = pa.array(c_url, pa.string())
        c_host_arr = pa.array(c_host, pa.string())
    c_hash = url_hash64_arrow(c_url_arr)

    def _col(name, default, typ):
        if name in batch.column_names:
            col = batch[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pc.fill_null(col.cast(typ), default)
        return pa.array(np.full(n, default), typ) if typ != pa.string() else pa.nulls(n, typ).fill_null(default)

    return pa.Table.from_arrays(
        [
            c_url_arr,
            c_host_arr,
            pa.array(c_hash, pa.uint64()),
            _col("title", "", pa.string()),
            _col("priority", 0, pa.int32()),
            _col("depth", depth, pa.int32()),
            pa.array(np.full(n, round_no, dtype=np.int64), pa.int64()),
        ],
        schema=FRONTIER,
    )


class SeenCheckStage:
    """map_batches stage: keep only rows whose url_hash is newly admitted.

    With ``only_kind`` set, rows of other kinds pass through untouched
    (used in the fused round pipeline where page rows and link rows
    share one stream)."""

    def __init__(self, pool: SeenFilterPool, only_kind: str | None = None):
        self.pool = pool
        self.only_kind = only_kind

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if self.only_kind is not None:
            applies = pc.equal(batch["kind"], self.only_kind)
            idx = np.nonzero(applies.to_numpy(zero_copy_only=False))[0]
            if len(idx) == 0:
                return batch
            hashes = (
                batch["url_hash"]
                .take(pa.array(idx))
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64, copy=False)
            )
            new = self.pool.check_and_add(hashes)
            keep = np.ones(batch.num_rows, dtype=bool)
            keep[idx] = new
            return batch.filter(pa.array(keep))
        hashes = (
            batch["url_hash"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64, copy=False)
        )
        mask = self.pool.check_and_add(hashes)
        return batch.filter(pa.array(mask))


def _schedule_group(group: pa.Table, budgets: dict, default_tokens: int) -> pa.Table:
    """One host's frontier slice -> deterministic slot order + budget cut."""
    host = group["host"][0].as_py()
    tokens = budgets.get(host, default_tokens)
    order = pc.sort_indices(
        group,
        sort_keys=[
            ("priority", "ascending"),
            ("discovered_ts", "ascending"),
            ("url_hash", "ascending"),
        ],
    )
    group = group.take(order)
    n = group.num_rows
    slots = pa.array(np.arange(n, dtype=np.int32))
    scheduled = pa.array(np.arange(n) < tokens)
    return group.append_column("fetch_slot", slots).append_column(
        "scheduled", scheduled
    )


# Above this many frontier rows the politeness schedule runs as a
# distributed groupby(host) shuffle; below it, the same computation is a
# single vectorized sort on the (already materialized) round frontier —
# identical output, none of the shuffle fixed cost.
DRIVER_SCHEDULE_MAX_ROWS = 200_000


def _schedule_driver(tbl: pa.Table, budgets: dict, default_tokens: int) -> pa.Table:
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("host", "ascending"),
            ("priority", "ascending"),
            ("discovered_ts", "ascending"),
            ("url_hash", "ascending"),
        ],
    )
    tbl = tbl.take(order)
    hosts = tbl["host"].to_pylist()
    n = len(hosts)
    slots = np.zeros(n, dtype=np.int32)
    scheduled = np.zeros(n, dtype=bool)
    i = 0
    while i < n:
        j = i
        h = hosts[i]
        while j < n and hosts[j] == h:
            j += 1
        tokens = budgets.get(h, default_tokens)
        slots[i:j] = np.arange(j - i, dtype=np.int32)
        scheduled[i : min(j, i + tokens)] = True
        i = j
    return tbl.append_column(
        "fetch_slot", pa.array(slots, pa.int32())
    ).append_column("scheduled", pa.array(scheduled))


class HostRanks:
    """Bounded host-rank lookup for round caps: two parallel numpy
    arrays (sorted ``url_hash64(host)`` u64, i64 rank) — 16 bytes/host
    vs ~100+ bytes/entry for a Python host-name dict, and shareable
    across tasks via one ``ray.put`` without host-name strings ever
    collecting on the driver.  At the 10^10-URL design point (~10^7-8
    hosts) that is a few hundred MB of arrays instead of GBs of dict.
    Lookups are a vectorized ``searchsorted``; unknown hosts rank 0.
    Hashes are masked to 62 bits (PageRank node-id space); a cross-host
    collision merely shares a rank — harmless for cap ordering."""

    __slots__ = ("hashes", "ranks")
    _MASK = np.uint64((1 << 62) - 1)

    def __init__(self, hashes: np.ndarray, ranks: np.ndarray):
        order = np.argsort(hashes)
        self.hashes = np.ascontiguousarray(hashes[order])
        self.ranks = np.ascontiguousarray(ranks[order])

    @classmethod
    def from_dict(cls, d: dict) -> "HostRanks":
        if not d:
            return cls(np.zeros(0, np.uint64), np.zeros(0, np.int64))
        h = url_hash64_arrow(pa.array(list(d), pa.string())) & cls._MASK
        r = np.fromiter(d.values(), np.int64, len(d))
        return cls(h, r)

    def lookup(self, hosts) -> np.ndarray:
        """pyarrow string column (or list) -> i64 rank array."""
        if isinstance(hosts, list):
            hosts = pa.array(hosts, pa.string())
        n = len(hosts)
        if n == 0 or len(self.hashes) == 0:
            return np.zeros(n, np.int64)
        h = url_hash64_arrow(hosts) & self._MASK
        pos = np.minimum(
            np.searchsorted(self.hashes, h), len(self.hashes) - 1
        )
        hit = self.hashes[pos] == h
        out = np.zeros(n, np.int64)
        out[hit] = self.ranks[pos[hit]]
        return out

    def get(self, host: str, default: int = 0) -> int:
        r = int(self.lookup([host])[0])
        return r if r != 0 else default

    def __len__(self) -> int:
        return len(self.hashes)


def _rank_array(host_ranks, hosts) -> np.ndarray:
    """Ranks for a host column: vectorized via ``HostRanks.lookup``;
    plain dicts (tests / hand-rolled configs) keep the small path."""
    if isinstance(host_ranks, HostRanks):
        return host_ranks.lookup(hosts)
    hl = hosts if isinstance(hosts, list) else hosts.to_pylist()
    return np.asarray(
        [int(host_ranks.get(h, 0)) for h in hl], dtype=np.int64
    )


def rank_hosts(
    edges_ds, src_col: str = "src_host", dst_col: str = "dst_host"
) -> HostRanks:
    """Host centrality scores for ``CrawlConfig.host_ranks``: fixed-
    point PageRank (``stages/window.pagerank``) over a host-level link
    graph.  Hosts hash to 62-bit node ids with the vectorized
    ``url_hash64_arrow`` kernel inside the workers; the PageRank output
    (node, pr_rank) IS the rank table — host-name strings never
    collect on the driver.  Returns a ``HostRanks`` (higher = more
    central) consumed by ``_apply_round_cap`` / ``_cap_quotas``."""
    from ..stages.window import pagerank

    mask = HostRanks._MASK

    def to_ids(batch: pa.Table) -> pa.Table:
        s = (url_hash64_arrow(batch[src_col]) & mask).astype(np.int64)
        d = (url_hash64_arrow(batch[dst_col]) & mask).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
            }
        )

    ids = edges_ds.map_batches(to_ids, batch_format="pyarrow")
    pr_tbl = pa.concat_tables(
        ray.get(pagerank(ids).to_arrow_refs()), promote_options="default"
    )
    nodes = (
        pr_tbl["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    ranks = (
        pr_tbl["pr_rank"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    return HostRanks(nodes, ranks)


def _apply_round_cap(
    sched_tbl: pa.Table, host_ranks: dict, cap: int
) -> pa.Table:
    """Keep only the top-``cap`` scheduled rows, ordered by descending
    host rank then the deterministic slot order; the rest flip to
    ``scheduled = False`` and flow into the round's deferred set."""
    sched = sched_tbl["scheduled"].to_numpy(zero_copy_only=False).copy()
    idx = np.flatnonzero(sched)
    if len(idx) <= cap:
        return sched_tbl
    neg_rank = -_rank_array(host_ranks, sched_tbl["host"])[idx]
    prio = sched_tbl["priority"].to_numpy(zero_copy_only=False)[idx]
    ts = (
        sched_tbl["discovered_ts"]
        .combine_chunks()
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)[idx]
    )
    uh = (
        sched_tbl["url_hash"]
        .combine_chunks()
        .cast(pa.uint64())
        .to_numpy(zero_copy_only=False)[idx]
    )
    order = np.lexsort((uh, ts, prio, neg_rank))
    sched[idx[order[cap:]]] = False
    col = sched_tbl.schema.get_field_index("scheduled")
    return sched_tbl.set_column(
        col, "scheduled", pa.array(sched, pa.bool_())
    )


def _schedule(
    frontier_tbl: pa.Table, budgets: dict, default_tokens: int
) -> pa.Table:
    if frontier_tbl.num_rows <= DRIVER_SCHEDULE_MAX_ROWS:
        return _schedule_driver(frontier_tbl, budgets, default_tokens)
    ds = ray.data.from_arrow(frontier_tbl)
    return _to_table(
        ds.groupby("host").map_groups(
            lambda g: _schedule_group(g, budgets, default_tokens),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# distributed frontier path (disk mode, frontier above the driver threshold)
#
# The frontier lives as partitioned Parquet between rounds; the driver
# holds only paths + counts.  A round is:
#
#   read frontier dirs ──map_batches(robots gate + local per-host
#   top-tokens precut; losers written straight back to disk by the
#   WORKERS)──groupby(host_part)──exact per-host schedule (non-scheduled
#   candidates also worker-written)──> scheduled rows (≤ Σ_host tokens,
#   the per-round politeness budget — the only frontier slice the driver
#   ever materializes)
#
# The local precut is exact: the global top-``tokens_h`` of host h is
# contained in the union of each block's top-``tokens_h``, so the
# candidate shuffle carries ≤ blocks x hosts x tokens rows instead of
# the whole frontier.  Worker-side deferred writes use content-derived
# file names (md5 of the block's url_hash bytes), so Ray task
# re-execution overwrites the same file instead of duplicating rows.
# ---------------------------------------------------------------------------

_FRONTIER_SORT = [
    ("host", "ascending"),
    ("priority", "ascending"),
    ("discovered_ts", "ascending"),
    ("url_hash", "ascending"),
]

CAND_SCHEMA = pa.schema([*FRONTIER, ("host_part", pa.int64())])
SCHED_SCHEMA = pa.schema([*FRONTIER, ("fetch_slot", pa.int32())])

# worker-process-global cache: ray.get of a pickled policy object
# re-deserializes per call, so cache it per worker (pages are fetched by
# reused worker processes; one live policy per worker)
_POLICY_CACHE: dict = {}


def _cached_policy(ref):
    key = ref.hex()
    if key not in _POLICY_CACHE:
        _POLICY_CACHE.clear()
        _POLICY_CACHE[key] = ray.get(ref)
    return _POLICY_CACHE[key]


def compact_checkpoint(checkpoint_dir: str) -> dict:
    """Garbage-collect consumed frontier state from a checkpoint.

    A crawl round fully consumes the previous round's frontier files
    (deferred dirs, reseed_clean dirs, frontier_next files, seed
    files); only the paths named by the CURRENT manifest are live.
    Everything else under the checkpoint that is frontier state — NOT
    the union page/link partitions, which are the crawl's output — is
    deleted.  At the 10^10 design point this is the difference between
    a checkpoint that grows with Σ rounds' frontier sizes and one that
    holds a single frontier generation.

    Returns {"removed": [...], "kept": [...]} (relative paths)."""
    import shutil

    mpath = os.path.join(checkpoint_dir, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    live = {
        os.path.normpath(os.path.join(checkpoint_dir, p))
        for p in manifest.get("frontier", [])
    }
    removed, kept = [], []

    def consider(path: str) -> None:
        norm = os.path.normpath(path)
        rel = os.path.relpath(norm, checkpoint_dir)
        if norm in live:
            kept.append(rel)
            return
        if os.path.isdir(norm):
            shutil.rmtree(norm, ignore_errors=True)
        elif os.path.exists(norm):
            os.remove(norm)
        removed.append(rel)

    for name in sorted(os.listdir(checkpoint_dir)):
        full = os.path.join(checkpoint_dir, name)
        if name.startswith(("seeds-", "reseed_clean-")):
            consider(full)
        elif name.startswith("round="):
            for sub in ("deferred", "frontier_next.parquet"):
                p = os.path.join(full, sub)
                if os.path.exists(p):
                    consider(p)
    return {"removed": removed, "kept": kept}


def bootstrap_robots(
    store: PageStore,
    hosts,
    default_delay_ms: int = 1000,
    user_agent: str = "*",
) -> RobotsPolicy:
    """FETCH and parse each host's /robots.txt into the broadcast
    policy (north_star: per-host politeness token-bucket with robots.txt
    caching; the reference obeys none).

    One bucket-aligned fetch of the /robots.txt urls; the PARSING runs
    in the fetch workers (one ``RobotsPolicy.from_robots_txt`` per
    host), and only tiny (host, prefixes, delay) rule rows reach the
    driver — at 10^6 hosts the result is still megabytes.  Missing
    robots.txt (404) means allow-all at the default delay, per the
    standard."""
    import json as _json

    tbl = pa.table(
        {
            "url": pa.array(
                [f"https://{h}/robots.txt" for h in sorted(set(hosts))],
                pa.string(),
            )
        }
    )

    def parse(batch: pa.Table) -> pa.Table:
        out_h, out_p, out_d, out_s, out_a = [], [], [], [], []
        for url, html, status in zip(
            batch["url"].to_pylist(),
            batch["html"].to_pylist(),
            batch["status"].to_pylist(),
        ):
            host = host_of(url)
            text = (
                html.decode("utf-8", "replace")
                if status == 200 and html is not None
                else ""
            )
            pol = RobotsPolicy.from_robots_txt(
                {host: text}, user_agent=user_agent
            )
            out_h.append(host)
            out_p.append(_json.dumps(list(pol.disallow.get(host, ()))))
            out_d.append(pol.crawl_delay_ms.get(host, -1))
            out_s.append(_json.dumps(list(pol.sitemaps.get(host, ()))))
            out_a.append(_json.dumps(list(pol.allow.get(host, ()))))
        return pa.table(
            {
                "host": pa.array(out_h, pa.string()),
                "prefixes": pa.array(out_p, pa.string()),
                "delay_ms": pa.array(out_d, pa.int64()),
                "sitemaps": pa.array(out_s, pa.string()),
                "allows": pa.array(out_a, pa.string()),
            }
        )

    rows = (
        store.fetch_aligned(tbl)
        .map_batches(parse, batch_format="pyarrow")
        .take_all()
    )
    disallow = {r["host"]: _json.loads(r["prefixes"]) for r in rows}
    delays = {
        r["host"]: int(r["delay_ms"]) for r in rows if r["delay_ms"] >= 0
    }
    sitemaps = {
        r["host"]: _json.loads(r["sitemaps"])
        for r in rows
        if r["sitemaps"] != "[]"
    }
    allow = {
        r["host"]: _json.loads(r["allows"])
        for r in rows
        if r["allows"] != "[]"
    }
    return RobotsPolicy(
        disallow=disallow,
        crawl_delay_ms=delays,
        default_delay_ms=default_delay_ms,
        sitemaps=sitemaps,
        allow=allow,
    )


def sitemap_seeds(
    store: PageStore,
    policy: RobotsPolicy,
    priority: int = 0,
    max_depth: int = 2,
) -> "ray.data.Dataset":
    """Seed the frontier from the hosts' robots-declared sitemaps
    (sitemaps.org protocol; the standard-web counterpart of the
    reference's list-API discovery).

    Per depth level: ONE bucket-aligned fetch of the current sitemap
    urls, ``<loc>`` parsing in the fetch workers, page urls stay a
    DATASET (a big host's url list never lands on the driver); only
    nested ``<sitemapindex>`` urls — few per host by construction —
    come back to drive the next level, bounded by ``max_depth``.
    Returned rows are (url, priority) seed schema, robots-ungated (the
    crawl's own gate applies, same as any discovered link)."""
    from ..functions.sitemap import parse_sitemap

    current = sorted({u for us in policy.sitemaps.values() for u in us})
    seen: set = set(current)
    page_parts: list = []
    for _ in range(max_depth):
        if not current:
            break
        tbl = pa.table({"url": pa.array(current, pa.string())})

        def parse(batch: pa.Table) -> pa.Table:
            pages: list = []
            nested: list = []
            for html, status in zip(
                batch["html"].to_pylist(), batch["status"].to_pylist()
            ):
                if status != 200 or html is None:
                    continue
                p, n = parse_sitemap(html.decode("utf-8", "replace"))
                pages.extend(p)
                nested.extend(n)
            return pa.table(
                {
                    "url": pa.array(pages + nested, pa.string()),
                    "nested": pa.array(
                        [False] * len(pages) + [True] * len(nested),
                        pa.bool_(),
                    ),
                }
            )

        mat = (
            store.fetch_aligned(tbl)
            .map_batches(parse, batch_format="pyarrow")
            .materialize()  # sitemap rows only; blocks stay in the store
        )

        def keep_pages(batch: pa.Table, _p=priority) -> pa.Table:
            sub = batch.filter(
                pa.compute.invert(batch["nested"].combine_chunks())
            )
            return pa.table(
                {
                    "url": sub["url"],
                    "priority": pa.array(
                        [_p] * sub.num_rows, pa.int64()
                    ),
                }
            )

        page_parts.append(
            mat.map_batches(keep_pages, batch_format="pyarrow")
        )
        nested_rows = mat.map_batches(
            lambda b: b.filter(b["nested"].combine_chunks()),
            batch_format="pyarrow",
        ).take_all()  # index urls: few per host by construction
        current = sorted(
            {r["url"] for r in nested_rows} - seen
        )
        seen.update(current)
    if not page_parts:
        # from_arrow, not from_items([]): a zero-block dataset has a
        # None schema, so downstream consumers inspecting seed columns
        # would break on the no-sitemaps path
        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "priority": pa.array([], pa.int64()),
                }
            )
        )
    out = page_parts[0]
    for p in page_parts[1:]:
        out = out.union(p)
    return out


def _robots_keep_mask(batch: pa.Table, robots) -> np.ndarray:
    """Vectorized-adjacent robots gate: only rows whose HOST has
    disallow rules pay a per-URL ``allowed`` call; every other row is
    admitted by a numpy membership test.  On a typical web most hosts
    publish no disallows, so the Python loop touches a sliver."""
    n = batch.num_rows
    keep = np.ones(n, dtype=bool)
    ruled = robots.hosts_with_rules()
    if not ruled:
        return keep
    hosts = np.asarray(batch["host"].to_pylist(), dtype=object)
    check = np.isin(hosts, list(ruled))
    if not check.any():
        return keep
    urls = batch["url"].to_pylist()
    for i in np.nonzero(check)[0]:
        keep[i] = robots.allowed(urls[i])
    return keep


def _host_ranks(t: pa.Table, budgets: dict, default_tokens: int):
    """Per-host rank + token budget for a table ALREADY sorted by
    ``_FRONTIER_SORT``.  Vectorized over rows; Python only per distinct
    host (budget lookup)."""
    hosts = np.asarray(t["host"].to_pylist(), dtype=object)
    n = len(hosts)
    idx = np.arange(n)
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = hosts[1:] != hosts[:-1]
    grp_start = np.maximum.accumulate(np.where(change, idx, 0))
    rank = (idx - grp_start).astype(np.int32)
    tok = np.empty(n, dtype=np.int64)
    starts = np.append(np.nonzero(change)[0], n)
    for s, e in zip(starts[:-1], starts[1:]):
        tok[s:e] = budgets.get(hosts[s], default_tokens)
    return rank, tok


def _write_deferred(t: pa.Table, deferred_dir: str, prefix: str) -> None:
    import hashlib as _hl

    import pyarrow.parquet as _pq

    digest = _hl.md5(
        np.asarray(t["url_hash"].to_pylist(), dtype=np.uint64).tobytes()
    ).hexdigest()[:16]
    _pq.write_table(
        t, os.path.join(deferred_dir, f"{prefix}-{digest}.parquet")
    )


def _cap_quotas(meta: pa.Table, host_ranks: dict, cap: int):
    """Global rank-aware cut -> per-host scheduled-slot quotas.

    Within a host the scheduled rows are slot-ordered by the SAME keys
    the global cut sorts on, so whatever the cross-host interleaving,
    each host's kept set is a prefix of its slots — {host: quota} fully
    describes the exact global top-``cap``.  Returns None when under
    capacity (no cut needed)."""
    n = meta.num_rows
    if n <= cap:
        return None
    hosts = meta["host"].to_pylist()
    neg_rank = -_rank_array(host_ranks, meta["host"])
    prio = meta["priority"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = meta["discovered_ts"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    uh = (
        meta["url_hash"]
        .combine_chunks()
        .cast(pa.uint64())
        .to_numpy(zero_copy_only=False)
    )
    order = np.lexsort((uh, ts, prio, neg_rank))
    from collections import Counter

    kept = Counter(hosts[i] for i in order[:cap])
    return dict(kept)


def _cap_filter_fn(quota_ref, deferred_dir: str):
    """map_batches stage: keep ``fetch_slot < quota[host]``; losers are
    deferred in place (content-named, idempotent under task retry)."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        q = ray.get(quota_ref)
        hosts = batch["host"].to_pylist()
        slots = batch["fetch_slot"].to_numpy(zero_copy_only=False)
        keep = np.asarray(
            [s < q.get(h, 0) for h, s in zip(hosts, slots)], dtype=bool
        )
        if not keep.all():
            _write_deferred(
                batch.filter(pa.array(~keep)).drop_columns(
                    ["fetch_slot"]
                ),
                deferred_dir,
                "cap",
            )
        return batch.filter(pa.array(keep))

    return fn


def _gate_precut_fn(policy_ref, deferred_dir: str, num_parts: int = 64):
    """map_batches stage: robots gate + exact local per-host precut.

    Rows beyond a host's local top-``tokens`` cannot be in the global
    top-``tokens`` — they are deferred IN PLACE (written to the round's
    deferred dir by this task); survivors stream to the candidate
    shuffle tagged with ``host_part = hash(host) % num_parts``."""

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return CAND_SCHEMA.empty_table()
        batch = batch.select(FRONTIER.names).cast(FRONTIER)
        robots, budgets, default_tokens = _cached_policy(policy_ref)
        batch = batch.filter(pa.array(_robots_keep_mask(batch, robots)))
        if batch.num_rows == 0:
            return CAND_SCHEMA.empty_table()
        batch = batch.take(pc.sort_indices(batch, sort_keys=_FRONTIER_SORT))
        rank, tok = _host_ranks(batch, budgets, default_tokens)
        cand_mask = rank < tok
        if not cand_mask.all():
            _write_deferred(
                batch.filter(pa.array(~cand_mask)), deferred_dir, "pre"
            )
        cand = batch.filter(pa.array(cand_mask))
        memo: dict = {}
        hp = np.fromiter(
            (
                memo.setdefault(h, url_hash64(h) % num_parts)
                for h in cand["host"].to_pylist()
            ),
            dtype=np.int64,
            count=cand.num_rows,
        )
        return cand.append_column("host_part", pa.array(hp, pa.int64()))

    return fn


def _sched_exact_fn(policy_ref, deferred_dir: str):
    """map_groups stage over ``host_part`` partitions: the exact global
    per-host schedule (same sort + budget cut as ``_schedule_driver``).
    Non-scheduled candidates are deferred in place; only scheduled rows
    (with their fetch_slot) leave the task."""

    def fn(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return SCHED_SCHEMA.empty_table()
        robots, budgets, default_tokens = _cached_policy(policy_ref)
        group = group.drop_columns(["host_part"])
        group = group.take(pc.sort_indices(group, sort_keys=_FRONTIER_SORT))
        rank, tok = _host_ranks(group, budgets, default_tokens)
        mask = rank < tok
        if not mask.all():
            _write_deferred(
                group.filter(pa.array(~mask)), deferred_dir, "cand"
            )
        sched = group.filter(pa.array(mask))
        return sched.append_column(
            "fetch_slot", pa.array(rank[mask], pa.int32())
        )

    return fn


def _parquet_files_in(paths) -> list:
    import glob as _glob

    files = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                sorted(
                    _glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
                )
            )
        elif os.path.exists(p):
            files.append(p)
    return files


def _frontier_row_count(paths) -> int:
    """Metadata-only row count over frontier parquet dirs (no data read)."""
    import pyarrow.parquet as _pq

    return sum(_pq.read_metadata(f).num_rows for f in _parquet_files_in(paths))


def _read_frontier_paths(paths) -> pa.Table:
    """Driver-side read of a BELOW-THRESHOLD frontier (bounded by
    ``driver_schedule_max_rows``; column-pruned to the frontier schema)."""
    import pyarrow.parquet as _pq

    files = _parquet_files_in(paths)
    if not files:
        return FRONTIER.empty_table()
    tables = [
        _pq.read_table(f, columns=list(FRONTIER.names)) for f in files
    ]
    return (
        pa.concat_tables(tables, promote_options="permissive")
        .select(FRONTIER.names)
        .cast(FRONTIER)
        .combine_chunks()
    )


def _paths_fingerprint(paths) -> str:
    """Order-insensitive lineage fingerprint of a frontier-on-disk state:
    md5 over the sorted (basename, rows) pairs.  Deferred file names are
    content-derived (md5 of url_hash bytes), so this binds content for
    the deferred part and cardinality for the link part — without the
    driver ever reading a URL."""
    import hashlib as _hl

    import pyarrow.parquet as _pq

    entries = sorted(
        f"{os.path.basename(f)}:{_pq.read_metadata(f).num_rows}"
        for f in _parquet_files_in(paths)
    )
    return _hl.md5("\n".join(entries).encode()).hexdigest()[:16]


class DiscoverStage:
    """fetched pages -> outgoing frontier candidates (link extraction,
    reference hub-page scans ``exchange/weex.py:30-60``).  Children carry
    ``depth = parent depth + 1``; pages at ``max_depth`` emit nothing."""

    # crawler-trap guards (all vectorizable string checks, applied
    # per-href before canonicalization):
    # - binary extensions a text crawler never wants,
    # - an absolute url-length cap (infinite-calendar / session-id
    #   traps grow urls without bound; 2048 is the de-facto web cap),
    # - a repeated-path-segment cap (the classic /a/b/a/b/a/b loop
    #   trap: any segment appearing more than seg_repeat_max times is
    #   a cycle no real site needs; 2 allows /en/docs/en-style reuse
    #   once while catching the third lap of a loop).
    SKIP_EXTENSIONS = (
        ".jpg", ".jpeg", ".png", ".gif", ".webp", ".ico", ".svg",
        ".mp4", ".mp3", ".avi", ".mov", ".zip", ".gz", ".tar", ".rar",
        ".exe", ".dmg", ".iso", ".woff", ".woff2", ".ttf", ".css",
    )

    def __init__(
        self,
        max_depth: int = 8,
        max_url_len: int = 2048,
        seg_repeat_max: int = 2,
        links_fn=None,
    ):
        self.max_depth = max_depth
        self.max_url_len = max_url_len
        self.seg_repeat_max = seg_repeat_max
        self.links_fn = links_fn

    def _trapped(self, url: str) -> bool:
        if len(url) > self.max_url_len:
            return True
        path = url.split("://", 1)[-1].split("?", 1)[0]
        segs = [s for s in path.split("/")[1:] if s]
        if len(segs) > self.seg_repeat_max:
            counts: dict = {}
            for s in segs:
                n = counts.get(s, 0) + 1
                if n > self.seg_repeat_max:
                    return True
                counts[s] = n
        return False

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.html_text import base_href, links_from_page

        out_urls, out_titles, out_prio, out_depth = [], [], [], []
        for url, html, status, prio, depth in zip(
            batch["url"].to_pylist(),
            batch["html"].to_pylist(),
            batch["status"].to_pylist(),
            batch["priority"].to_pylist(),
            batch["depth"].to_pylist(),
        ):
            if status != 200 or html is None or depth >= self.max_depth:
                continue
            doc = html.decode("utf-8", "replace")
            # <base href> overrides the page url as join base (HTML
            # spec; itself resolved against the page for relative
            # bases).  Plain urljoin — canonicalize would strip the
            # trailing slash the relative join depends on.  Absent on
            # the synthetic web -> no-op there.
            b = base_href(doc)
            if b:
                from urllib.parse import urljoin as _urljoin

                join_base = _urljoin(url, b)
            else:
                join_base = url
            pairs = (
                self.links_fn(url, doc)
                if self.links_fn is not None
                else links_from_page(doc)
            )
            for href, text in pairs:
                if not href or href.startswith(("javascript:", "mailto:", "#")):
                    continue
                # strip fragment AND query before the extension check:
                # 'photo.png#gallery' must not bypass SKIP_EXTENSIONS
                low = href.lower().split("#", 1)[0].split("?", 1)[0]
                if low.endswith(self.SKIP_EXTENSIONS):
                    continue
                u = canonicalize(href, base=join_base)
                if self._trapped(u):
                    continue
                out_urls.append(u)
                out_titles.append(text)
                out_prio.append(prio)
                out_depth.append(depth + 1)
        return pa.table(
            {
                "url": pa.array(out_urls, pa.string()),
                "title": pa.array(out_titles, pa.string()),
                "priority": pa.array(out_prio, pa.int32()),
                "depth": pa.array(out_depth, pa.int32()),
            }
        )


_UNION_EXTRA = [
    ("fetch_slot", pa.int32()),
    ("fetch_round", pa.int32()),
    ("status", pa.int32()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("exchange", pa.string()),
    ("article_id", pa.string()),
    ("release_time", pa.string()),
    ("text", pa.string()),
    ("xstatus", pa.string()),
]
UNION_SCHEMA = pa.schema(
    [("kind", pa.string()), *FRONTIER, *_UNION_EXTRA]
)


def apply_title_filters(canon: pa.Table, filters: dict) -> pa.Table:
    """M12: drop frontier candidates on filtered hosts whose anchor
    title contains none of the host's keep-substrings (vectorized
    ``match_substring`` per (host, pattern), reference
    ``exchange/lbank.py:179-184``)."""
    if not filters or canon.num_rows == 0:
        return canon
    hosts = canon["host"].combine_chunks()
    titles = canon["title"].combine_chunks()
    keep = np.ones(canon.num_rows, dtype=bool)
    for host, pats in filters.items():
        on_host = pc.equal(hosts, host).to_numpy(zero_copy_only=False)
        if not on_host.any():
            continue
        ok = np.zeros(canon.num_rows, dtype=bool)
        for p in pats:
            ok |= pc.match_substring(titles, p).to_numpy(
                zero_copy_only=False
            )
        keep &= ok | ~on_host
    return canon.filter(pa.array(keep))


class ProcessStage:
    """Fused per-round stage: fetched batch -> page rows + link rows.

    One ``map_batches`` pass does extraction (M1-M7 via ExtractStage)
    AND link discovery — including the M12 title filter — emitting a
    union-typed table (``kind`` = 'page' | 'link') so a crawl round is
    a single streaming pipeline execution:
    fetch -> process -> seen-check(links)."""

    def __init__(
        self,
        extract: ExtractStage,
        round_no: int,
        max_depth: int,
        title_filters: dict | None = None,
        links_fn=None,
    ):
        self.extract = extract
        self.discover = DiscoverStage(max_depth, links_fn=links_fn)
        self.round_no = round_no
        self.title_filters = title_filters or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ext = self.extract(batch)
        page_part = pa.Table.from_arrays(
            [
                pa.array(["page"] * n, pa.string()),
                *(batch[name].combine_chunks() for name in FRONTIER.names),
                batch["fetch_slot"].combine_chunks(),
                pa.array([self.round_no - 1] * n, pa.int32()),
                batch["status"].combine_chunks(),
                batch["warc_ts"].combine_chunks(),
                ext["exchange"].combine_chunks(),
                ext["article_id"].combine_chunks(),
                ext["release_time"].combine_chunks(),
                ext["text"].combine_chunks(),
                ext["status"].combine_chunks(),
            ],
            schema=UNION_SCHEMA,
        )
        links = self.discover(batch)
        canon = apply_title_filters(
            canonicalize_batch(links, round_no=self.round_no),
            self.title_filters,
        )
        ln = canon.num_rows
        nulls = {
            "fetch_slot": pa.nulls(ln, pa.int32()),
            "fetch_round": pa.nulls(ln, pa.int32()),
            "status": pa.nulls(ln, pa.int32()),
            "warc_ts": pa.nulls(ln, pa.timestamp("us", tz="UTC")),
            "exchange": pa.nulls(ln, pa.string()),
            "article_id": pa.nulls(ln, pa.string()),
            "release_time": pa.nulls(ln, pa.string()),
            "text": pa.nulls(ln, pa.string()),
            "xstatus": pa.nulls(ln, pa.string()),
        }
        link_part = pa.Table.from_arrays(
            [
                pa.array(["link"] * ln, pa.string()),
                *(canon[name].combine_chunks() for name in FRONTIER.names),
                *nulls.values(),
            ],
            schema=UNION_SCHEMA,
        )
        return pa.concat_tables([page_part, link_part])


@dataclass
class RoundMetrics:
    round_no: int
    frontier_in: int = 0
    robots_blocked: int = 0
    scheduled: int = 0
    deferred: int = 0
    fetched_ok: int = 0
    fetched_miss: int = 0
    tombstones: int = 0
    discovered_new: int = 0


def _read_union_part(rd: str, kind: str, columns, schema):
    """Column-pruned read of one kind partition of a round's union dir."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = _glob.glob(os.path.join(rd, "union", f"kind={kind}", "*.parquet"))
    if not files:
        if schema is not None:
            return pa.Table.from_pydict(
                {n: [] for n in schema.names}, schema=schema
            )
        return pa.table({c: pa.array([]) for c in columns})
    t = pa.concat_tables(pq.read_table(f, columns=columns) for f in files)
    if schema is not None:
        t = t.select(schema.names).cast(schema)
    return t.combine_chunks()


class CrawlRun:
    """Holds the per-round outputs + state of one crawl execution.

    Two storage modes: in-memory (no checkpoint_dir — tests/small runs;
    round outputs held as Arrow tables) and ``disk_rounds``
    (checkpoint_dir set — round pages are written by workers to
    partitioned Parquet and the driver never materializes them, the
    10^10-scale requirement)."""

    def __init__(self, cfg: CrawlConfig, checkpoint_dir: str | None = None):
        self.cfg = cfg
        self.checkpoint_dir = checkpoint_dir
        self.disk_rounds = checkpoint_dir is not None
        self.seen = SeenFilterPool(cfg.seen_shards, mode=cfg.seen_mode)
        self.metrics: list = []
        self.lineage: list = []
        self._fetched: list = []
        self._extracted: list = []
        self.rounds_done = 0

    # --- checkpointing -------------------------------------------------
    def _round_dir(self, k: int) -> str:
        return os.path.join(self.checkpoint_dir, f"round={k}")

    def _save_round(self, k: int, frontier_paths: list) -> None:
        """Checkpoint one completed round.  ``frontier_paths`` names the
        parquet files/dirs holding the pending frontier — written by the
        WORKERS in the distributed path, or a single driver-written file
        for a below-threshold round.  The driver records paths, never
        rows."""
        if not self.checkpoint_dir:
            return
        state_dir = os.path.join(self.checkpoint_dir, "state")
        os.makedirs(state_dir, exist_ok=True)
        for i, snap in enumerate(self.seen.snapshot()):
            np.savez(
                os.path.join(state_dir, f"seen_{i}.npz"),
                bloom=snap["bloom"],
                exact=snap.get("exact", np.zeros(0, dtype=np.uint64)),
                count=np.array([snap["count"]]),
                mode=np.array([snap["mode"]]),
            )
        manifest = {
            "rounds_done": k + 1,
            "seen_shards": self.cfg.seen_shards,
            "frontier": [
                os.path.relpath(p, self.checkpoint_dir)
                for p in frontier_paths
            ],
            "metrics": [m.__dict__ for m in self.metrics],
            "lineage": self.lineage,
        }
        # adaptive-politeness multipliers survive resume: a host that
        # throttled before the crash stays slowed on the next
        # invocation (cron tick) instead of hammering it again at the
        # static budget
        if getattr(self.cfg, "adaptive", None) is not None:
            manifest["adaptive_mult"] = dict(self.cfg.adaptive.mult)
        tmp = os.path.join(self.checkpoint_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # atomic commit: the manifest only ever names fully-written rounds
        os.replace(tmp, os.path.join(self.checkpoint_dir, "manifest.json"))

    def _purge_uncommitted(self, keep_paths: list) -> None:
        """Delete round dirs / seed / reseed-clean files a crashed
        invocation left behind past the last committed manifest.
        ``write_parquet`` names files by a per-execution UUID and never
        overwrites, so re-running an uncommitted round would append a
        second set of files next to the stale ones — and the
        whole-directory globs that consume link/deferred/clean dirs
        would then fetch those URLs twice.  Frontier paths named by the
        manifest always live inside ``round=j`` with j < rounds_done
        (``_save_round(k)`` commits rounds_done=k+1), so wiping
        j >= rounds_done can never drop committed state."""
        import glob as _glob
        import re as _re
        import shutil

        keep = {os.path.abspath(p) for p in keep_paths}
        for d in _glob.glob(os.path.join(self.checkpoint_dir, "round=*")):
            mm = _re.match(r"^round=(\d+)$", os.path.basename(d))
            if mm and int(mm.group(1)) >= self.rounds_done:
                shutil.rmtree(d, ignore_errors=True)
        stale = _glob.glob(
            os.path.join(self.checkpoint_dir, "seeds-r*.parquet")
        ) + _glob.glob(os.path.join(self.checkpoint_dir, "reseed_clean-r*"))
        for p in stale:
            if os.path.abspath(p) in keep:
                continue
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p):
                os.remove(p)

    def try_resume(self) -> list | None:
        """Restore seen-filter + metrics; return the pending frontier as
        a list of parquet paths, or None when there is no usable
        checkpoint.  Purges any uncommitted round outputs first so a
        crash-resume never double-writes (see ``_purge_uncommitted``)."""
        if not self.checkpoint_dir:
            return None
        mpath = os.path.join(self.checkpoint_dir, "manifest.json")
        if not os.path.exists(mpath):
            if os.path.isdir(self.checkpoint_dir):
                # crashed before the first manifest commit: treat as a
                # fresh run over a clean directory
                self._purge_uncommitted([])
            return None
        with open(mpath) as f:
            manifest = json.load(f)
        k = manifest["rounds_done"]
        snaps = []
        for i in range(self.cfg.seen_shards):
            z = np.load(
                os.path.join(self.checkpoint_dir, "state", f"seen_{i}.npz"),
                allow_pickle=False,
            )
            snaps.append(
                {
                    "mode": str(z["mode"][0]),
                    "count": int(z["count"][0]),
                    "bloom": z["bloom"],
                    "exact": z["exact"],
                }
            )
        self.seen.restore(snaps)
        self.metrics = [RoundMetrics(**m) for m in manifest["metrics"]]
        self.lineage = manifest.get("lineage", [])
        if (
            getattr(self.cfg, "adaptive", None) is not None
            and "adaptive_mult" in manifest
        ):
            self.cfg.adaptive.mult = {
                str(h): float(m)
                for h, m in manifest["adaptive_mult"].items()
            }
        self.rounds_done = k
        fr = manifest.get("frontier")
        if fr is not None:
            paths = [os.path.join(self.checkpoint_dir, p) for p in fr]
        else:
            # legacy (pre-path-list) checkpoint format: the pending
            # frontier is a single file in the last committed round dir
            legacy = os.path.join(
                self._round_dir(k - 1), "frontier_next.parquet"
            )
            paths = [legacy] if k > 0 and os.path.exists(legacy) else []
        self._purge_uncommitted(paths)
        return paths

    # --- results -------------------------------------------------------
    _FETCHED_COLS = [*FRONTIER.names, "fetch_slot", "status", "warc_ts", "fetch_round"]
    _EXTRACTED_COLS = [
        "url",
        "exchange",
        "article_id",
        "title",
        "release_time",
        "text",
        "xstatus",
    ]

    def _disk_pages(self, columns) -> pa.Table:
        parts = [
            _read_union_part(self._round_dir(j), "page", columns, None)
            for j in range(self.rounds_done)
        ]
        parts = [p for p in parts if p.num_rows]
        return (
            pa.concat_tables(parts).combine_chunks() if parts else None
        )

    def fetched_table(self) -> pa.Table:
        if self._fetched:
            return pa.concat_tables(self._fetched)
        if self.disk_rounds:
            return self._disk_pages(self._FETCHED_COLS)
        return None

    def extracted_table(self) -> pa.Table:
        if self._extracted:
            return pa.concat_tables(self._extracted)
        if self.disk_rounds:
            t = self._disk_pages(self._EXTRACTED_COLS)
            if t is None:
                return None
            return t.rename_columns(
                [c if c != "xstatus" else "status" for c in t.column_names]
            )
        return None

    def extracted_dataset(self) -> "ray.data.Dataset":
        """In disk mode this is a lazy partitioned read — the flagship
        analyze/report pipelines stream from the checkpoint without the
        driver ever holding page rows."""
        if self._extracted:
            return ray.data.from_arrow(self._extracted)
        assert self.disk_rounds

        def fix_cols(batch: pa.Table) -> pa.Table:
            batch = batch.select(self._EXTRACTED_COLS)
            return batch.rename_columns(
                [
                    c if c != "xstatus" else "status"
                    for c in batch.column_names
                ]
            )

        union_dirs = [
            os.path.join(self._round_dir(j), "union", "kind=page")
            for j in range(self.rounds_done)
            if os.path.isdir(
                os.path.join(self._round_dir(j), "union", "kind=page")
            )
        ]
        return ray.data.read_parquet(union_dirs).map_batches(
            fix_cols, batch_format="pyarrow"
        )

    def crawl_order(self) -> list:
        """Deterministic serialization of the fetch order:
        (round, host, slot)."""
        t = self.fetched_table()
        if t is None or t.num_rows == 0:
            return []
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("fetch_round", "ascending"),
                ("host", "ascending"),
                ("fetch_slot", "ascending"),
            ],
        )
        return pc.take(t["url"], order).to_pylist()

    def seen_set_size(self) -> int:
        return self.seen.total()


def _to_table(ds: "ray.data.Dataset", schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small, metadata-sized) Dataset as one Arrow table.

    Used only at round boundaries on frontier/extracted rows — never on
    HTML-bearing data mid-pipeline."""
    tables = [t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.Table.from_pydict(
            {n: [] for n in (schema.names if schema else [])},
            schema=schema,
        )
    return pa.concat_tables(tables, promote_options="permissive").combine_chunks()


def run_crawl(
    store: PageStore,
    seeds: "ray.data.Dataset",
    robots: RobotsPolicy,
    cfg: CrawlConfig,
    checkpoint_dir: str | None = None,
    stop_after_round: int | None = None,
    reseed: bool = False,
) -> CrawlRun:
    """Execute (or resume) a crawl.

    ``stop_after_round`` simulates a crash after k rounds for resume
    tests.  ``reseed=True`` is the incremental re-crawl (the reference's
    cron tick, ``run.sh:5-6``): on a resumed checkpoint, seeds re-enter
    the frontier even though already seen — list/hub pages are
    re-fetched every run while the seen filter still skips every
    already-fetched detail page, so only NEW articles are fetched.

    ``cfg.max_rounds`` is a per-invocation budget: every invocation
    (fresh, crash-resume, or cron tick) may run up to ``max_rounds``
    rounds beyond where the checkpoint left off."""
    run = CrawlRun(cfg, checkpoint_dir)

    # structured per-run log with retention (reference utils.py:25-52):
    # one JSONL file per invocation under {checkpoint}/logs, named by
    # the run's HK start time (deterministic when as_of_hk is pinned)
    runlog = None
    if checkpoint_dir:
        import datetime as _dt

        from ..state.runlog import RunLogger

        now = None
        if cfg.as_of_hk:
            now = _dt.datetime.strptime(
                cfg.as_of_hk, "%Y-%m-%d %H:%M:%S"
            ).replace(tzinfo=_dt.timezone(_dt.timedelta(hours=8)))
        runlog = RunLogger(os.path.join(checkpoint_dir, "logs"), now=now)
        runlog.info(
            "run_start",
            resumed=os.path.exists(
                os.path.join(checkpoint_dir, "manifest.json")
            ),
            reseed=reseed,
            max_rounds=cfg.max_rounds,
        )

    # frontier representation: in-memory mode holds an Arrow table on
    # the driver (small/test runs); disk mode holds a LIST OF PARQUET
    # PATHS — the driver materializes frontier rows only when a round is
    # below the driver-schedule threshold.
    frontier_tbl: pa.Table | None = None
    frontier_paths: list | None = run.try_resume()

    def _seed_frontier() -> pa.Table:
        # seed lists are tiny (one row per hub endpoint): canonicalize +
        # admit driver-side instead of paying a pipeline execution
        seed_tbl = _to_table(seeds)
        cand = canonicalize_batch(seed_tbl, depth=0, round_no=run.rounds_done)
        mask = run.seen.check_and_add(
            np.asarray(cand["url_hash"].to_pylist(), dtype=np.uint64)
        )
        # reseed forces seeds through (the idempotent insert above keeps
        # the filter consistent); fresh runs admit only unseen seeds
        return cand if reseed else cand.filter(pa.array(mask))

    if run.disk_rounds:
        import pyarrow.parquet as pq

        if frontier_paths is None or reseed:
            k0 = run.rounds_done
            cand = _seed_frontier()
            seed_file = os.path.join(checkpoint_dir, f"seeds-r{k0}.parquet")
            os.makedirs(checkpoint_dir, exist_ok=True)
            pq.write_table(cand, seed_file)
            if (
                reseed
                and frontier_paths
                and _frontier_row_count(frontier_paths)
            ):
                # strip re-seeded urls from the pending frontier (a seed
                # deferred at shutdown must not appear twice) — one
                # worker-side pass, the driver never reads the rows
                clean_dir = os.path.join(
                    checkpoint_dir, f"reseed_clean-r{k0}"
                )
                excl_ref = ray.put(
                    np.sort(
                        np.asarray(
                            cand["url_hash"].to_pylist(), dtype=np.uint64
                        )
                    )
                )

                def strip_seeds(batch: pa.Table) -> pa.Table:
                    batch = batch.select(FRONTIER.names).cast(FRONTIER)
                    excl = ray.get(excl_ref)
                    if len(excl) == 0 or batch.num_rows == 0:
                        return batch
                    h = np.asarray(
                        batch["url_hash"].to_pylist(), dtype=np.uint64
                    )
                    pos = np.searchsorted(excl, h)
                    pos[pos >= len(excl)] = 0
                    return batch.filter(pa.array(excl[pos] != h))

                ray.data.read_parquet(
                    _parquet_files_in(frontier_paths),
                    columns=list(FRONTIER.names),
                ).map_batches(
                    strip_seeds, batch_format="pyarrow"
                ).write_parquet(clean_dir)
                frontier_paths = [clean_dir, seed_file]
            else:
                frontier_paths = [seed_file]
    elif frontier_tbl is None:
        frontier_tbl = _seed_frontier()

    budgets = {
        h: robots.tokens_per_round(h, cfg.round_ms)
        for h in set(robots.crawl_delay_ms)
    }
    if cfg.adaptive is not None:
        # resumed multipliers (or a pre-seeded AdaptiveDelay) shape the
        # very first round's budgets, not just post-observation rounds
        for h in cfg.adaptive.mult:
            budgets[h] = cfg.adaptive.tokens_per_round(
                robots, h, cfg.round_ms
            )
    default_tokens = max(1, cfg.round_ms // max(1, robots.default_delay_ms))
    threshold = (
        cfg.driver_schedule_max_rows
        if cfg.driver_schedule_max_rows is not None
        else DRIVER_SCHEDULE_MAX_ROWS
    )
    policy_ref = None  # lazy one-time broadcast for the distributed path

    # max_rounds is a PER-INVOCATION budget: a resumed / re-seeded run
    # (cron tick) gets cfg.max_rounds fresh rounds, not what's left of
    # the previous tick's allowance (which reaches 0 and would silently
    # no-op every later tick).
    k = run.rounds_done
    round_budget_end = k + cfg.max_rounds
    while k < round_budget_end:
        # ---- frontier intake: choose the round's execution path -------
        distributed = False
        if run.disk_rounds:
            n_front = _frontier_row_count(frontier_paths)
            if n_front == 0:
                break
            if n_front > threshold:
                distributed = True
            else:
                frontier_tbl = _read_frontier_paths(frontier_paths)
        else:
            n_front = frontier_tbl.num_rows
            if n_front == 0:
                break
        m = RoundMetrics(round_no=k, frontier_in=n_front)

        if distributed:
            # robots + politeness fully in workers; losers written back
            # to disk by the tasks that gated them; the driver sees only
            # the scheduled slice (≤ Σ_host tokens, the round's fetch
            # budget — which the bucket-aligned fetch materializes
            # anyway)
            rd = run._round_dir(k)
            deferred_dir = os.path.join(rd, "deferred")
            os.makedirs(deferred_dir, exist_ok=True)
            if policy_ref is None:
                policy_ref = ray.put((robots, budgets, default_tokens))
            sched_ds = (
                ray.data.read_parquet(
                    _parquet_files_in(frontier_paths),
                    columns=list(FRONTIER.names),
                )
                .map_batches(
                    _gate_precut_fn(policy_ref, deferred_dir),
                    batch_format="pyarrow",
                )
                .groupby("host_part")
                .map_groups(
                    _sched_exact_fn(policy_ref, deferred_dir),
                    batch_format="pyarrow",
                )
            )
            if cfg.round_fetch_cap is not None:
                # exact global rank-aware cut, distributed: materialize
                # the scheduled slice (≤ Σ tokens — the round's fetch
                # budget, which the fetch pins anyway), pull ONLY its
                # metadata columns to compute per-host slot quotas, and
                # filter in the workers with losers deferred in place.
                sched_ds = sched_ds.materialize()
                meta = _to_table(
                    sched_ds.select_columns(
                        ["host", "priority", "discovered_ts", "url_hash"]
                    )
                )
                quotas = _cap_quotas(
                    meta, cfg.host_ranks, cfg.round_fetch_cap
                )
                if quotas is not None:
                    sched_ds = sched_ds.map_batches(
                        _cap_filter_fn(ray.put(quotas), deferred_dir),
                        batch_format="pyarrow",
                    )
            if cfg.fetch_fn is None:
                # FUSED round: the scheduled slice streams straight into
                # the bucket-keyed fetch inside the SAME execution —
                # no _to_table hop, no second pipeline startup.  The
                # schedule metrics are recovered from the written page
                # partition after the round (scheduled == page rows:
                # every scheduled row yields exactly one page row, 404s
                # and tombstones included).
                to_fetch = None
            else:
                # pluggable fetch stages (e.g. the live actor-pool
                # fetcher) take a materialized table; keep the two-step
                # path for them
                to_fetch = _to_table(sched_ds, SCHED_SCHEMA)
                n_deferred = _frontier_row_count([deferred_dir])
                m.scheduled, m.deferred = to_fetch.num_rows, n_deferred
                m.robots_blocked = n_front - to_fetch.num_rows - n_deferred
                if to_fetch.num_rows == 0:
                    run.metrics.append(m)
                    break
            deferred = None
        else:
            # 1. robots gate (pure, broadcast policy — never re-shipped;
            # driver-side only for frontiers below the threshold)
            allowed_tbl = frontier_tbl.filter(
                pa.array(_robots_keep_mask(frontier_tbl, robots))
            )
            m.robots_blocked = frontier_tbl.num_rows - allowed_tbl.num_rows

            if allowed_tbl.num_rows == 0:
                run.metrics.append(m)
                break

            # 2. politeness schedule on frontier metadata
            scheduled_tbl = _schedule(allowed_tbl, budgets, default_tokens)
            if cfg.round_fetch_cap is not None:
                scheduled_tbl = _apply_round_cap(
                    scheduled_tbl, cfg.host_ranks, cfg.round_fetch_cap
                )
            sched_mask = scheduled_tbl["scheduled"]
            to_fetch = scheduled_tbl.filter(sched_mask).drop_columns(
                ["scheduled"]
            )
            deferred = scheduled_tbl.filter(
                pc.invert(sched_mask)
            ).drop_columns(["fetch_slot", "scheduled"])
            m.scheduled, m.deferred = to_fetch.num_rows, deferred.num_rows

        # 3-5. fused round pipeline, ONE streaming execution:
        #      fetch (bucket-aligned tasks + worker-global bucket cache)
        #      -> process (extract M1-M7 + discover links, html dropped)
        #      -> seen-check on the link rows (admission actors)
        extract = ExtractStage(
            profiles=cfg.profiles,
            as_of_hk=cfg.as_of_hk,
            offset_days=cfg.offset_days,
        )
        fetch = cfg.fetch_fn or store.fetch_aligned
        fused = distributed and to_fetch is None
        round_ds = (
            (store.fetch_grouped(sched_ds) if fused else fetch(to_fetch))
            .map_batches(
                ProcessStage(
                    extract,
                    round_no=k + 1,
                    max_depth=cfg.max_depth,
                    title_filters=cfg.title_filters,
                    links_fn=cfg.links_fn,
                ),
                batch_format="pyarrow",
            )
            .map_batches(
                SeenCheckStage(run.seen, only_kind="link"),
                batch_format="pyarrow",
                # whole-block batches: each seen-check batch fans out one
                # RPC per shard, so RPC count = batches x shards — tiny
                # default batches made the shard RPC path the measured
                # admission ceiling (BENCH/BASELINE.md round-4 note)
                batch_size=None,
            )
        )
        if run.disk_rounds:
            # scale path: the round's pages (incl. extracted text) are
            # written by the WORKERS, partitioned by kind; the driver
            # reads back only pruned metric columns of the page part
            # (bounded by the round's fetch budget) — and the link part
            # only when next round's frontier fits under the threshold
            rd = run._round_dir(k)
            os.makedirs(rd, exist_ok=True)
            round_ds.write_parquet(
                os.path.join(rd, "union"), partition_cols=["kind"]
            )
            link_dir = os.path.join(rd, "union", "kind=link")
            stat_tbl = _read_union_part(
                rd, "page", ["status", "xstatus", "url", "host"], None
            )
            page_status = stat_tbl["status"]
            xstatus = stat_tbl["xstatus"]
            page_hosts = stat_tbl["host"]
            page_urls_for_lineage = stat_tbl["url"]
            n_pages = stat_tbl.num_rows
            if fused:
                # schedule metrics, recovered post-execution: every
                # scheduled row produced exactly one page row
                n_def_f = _frontier_row_count([deferred_dir])
                m.scheduled, m.deferred = n_pages, n_def_f
                m.robots_blocked = n_front - n_pages - n_def_f
                if n_pages == 0:
                    run.metrics.append(m)
                    break
            discovered_tbl = None
            n_links = _frontier_row_count([link_dir])
            if distributed:
                n_deferred = m.deferred
            else:
                n_deferred = deferred.num_rows
            if not distributed and n_deferred + n_links <= threshold:
                # small next-frontier: keep the single-file layout
                discovered_tbl = _read_union_part(
                    rd, "link", FRONTIER.names, FRONTIER
                )
        else:
            union_tbl = _to_table(round_ds, UNION_SCHEMA)
            page_mask = pc.equal(union_tbl["kind"], "page")
            pages_tbl = union_tbl.filter(page_mask)
            discovered_tbl = union_tbl.filter(pc.invert(page_mask)).select(
                FRONTIER.names
            )
            fetched_slim = pages_tbl.select(
                [*FRONTIER.names, "fetch_slot", "status", "warc_ts", "fetch_round"]
            )
            extracted_tbl = pa.Table.from_arrays(
                [
                    pages_tbl["url"].combine_chunks(),
                    pages_tbl["exchange"].combine_chunks(),
                    pages_tbl["article_id"].combine_chunks(),
                    pages_tbl["title"].combine_chunks(),
                    pages_tbl["release_time"].combine_chunks(),
                    pages_tbl["text"].combine_chunks(),
                    pages_tbl["xstatus"].combine_chunks(),
                ],
                names=[
                    "url",
                    "exchange",
                    "article_id",
                    "title",
                    "release_time",
                    "text",
                    "status",
                ],
            )
            page_status = pages_tbl["status"]
            xstatus = pages_tbl["xstatus"]
            page_hosts = pages_tbl["host"]
            page_urls_for_lineage = pages_tbl["url"]
            n_pages = pages_tbl.num_rows
            run._fetched.append(fetched_slim)
            run._extracted.append(extracted_tbl)

        m.fetched_ok = (
            pc.sum(pc.cast(pc.equal(page_status, 200), pa.int64())).as_py()
            or 0
        )
        m.fetched_miss = n_pages - m.fetched_ok
        m.tombstones = (
            pc.sum(
                pc.cast(pc.equal(xstatus, "tombstone"), pa.int64())
            ).as_py()
            or 0
        )
        if cfg.adaptive is not None and n_pages:
            # AIMD politeness: fold this round's per-host outcomes into
            # the delay multipliers and refresh next round's budgets.
            # The aggregate is host-cardinality-sized (driver-cheap);
            # statuses 429/503 are the throttle signals (RFC 6585 /
            # Retry-After semantics the live fetcher also honors).
            ht = pa.table(
                {
                    "h": page_hosts.combine_chunks(),
                    "thr": pc.cast(
                        pc.is_in(
                            page_status,
                            value_set=pa.array([429, 503], pa.int32()),
                        ),
                        pa.int64(),
                    ),
                    "ok": pc.cast(
                        pc.equal(page_status, 200), pa.int64()
                    ),
                }
            )
            hagg = ht.group_by("h").aggregate(
                [("thr", "sum"), ("ok", "sum")]
            )
            for h, nt, nk in zip(
                hagg["h"].to_pylist(),
                hagg["thr_sum"].to_pylist(),
                hagg["ok_sum"].to_pylist(),
            ):
                cfg.adaptive.observe(h, int(nk or 0), int(nt or 0))
                budgets[h] = cfg.adaptive.tokens_per_round(
                    robots, h, cfg.round_ms
                )
        # per-partition lineage: content hashes tying each round's
        # outputs to its inputs (recorded in the checkpoint manifest; a
        # resumed run verifies it is continuing the same crawl)
        def _content_hash(col) -> str:
            import hashlib as _hl

            urls = sorted(col.to_pylist()) if len(col) else []
            return _hl.md5("\n".join(urls).encode()).hexdigest()[:16]

        if run.disk_rounds and discovered_tbl is None:
            # scale layout: next frontier = this round's deferred dir(s)
            # + the worker-written link partition; the driver never reads
            # the rows, only parquet metadata
            m.discovered_new = n_links
            run.metrics.append(m)
            if distributed:
                next_paths = [deferred_dir, link_dir]
            else:
                next_paths = [link_dir]
                if deferred.num_rows:
                    import pyarrow.parquet as _pq

                    dd = os.path.join(rd, "deferred")
                    os.makedirs(dd, exist_ok=True)
                    _write_deferred(deferred, dd, "drv")
                    next_paths.insert(0, dd)
            frontier_paths = [
                p for p in next_paths if _frontier_row_count([p])
            ]
            run.lineage.append(
                {
                    "round": k,
                    "fetched": _content_hash(page_urls_for_lineage),
                    "frontier_next": _paths_fingerprint(frontier_paths),
                }
            )
            run._save_round(k, frontier_paths)
            if cfg.auto_compact:
                compact_checkpoint(checkpoint_dir)
        else:
            m.discovered_new = discovered_tbl.num_rows
            run.metrics.append(m)
            if discovered_tbl.num_rows:
                frontier_next = pa.concat_tables(
                    [deferred, discovered_tbl]
                ).combine_chunks()
            else:
                frontier_next = deferred
            run.lineage.append(
                {
                    "round": k,
                    "fetched": _content_hash(page_urls_for_lineage),
                    "frontier_next": _content_hash(frontier_next["url"]),
                }
            )
            if run.disk_rounds:
                import pyarrow.parquet as _pq

                ff = os.path.join(rd, "frontier_next.parquet")
                _pq.write_table(frontier_next, ff)
                frontier_paths = [ff]
                run._save_round(k, frontier_paths)
                if cfg.auto_compact:
                    compact_checkpoint(checkpoint_dir)
            else:
                frontier_tbl = frontier_next
        if runlog is not None:
            runlog.info(
                "round",
                **m.__dict__,
                frontier_next=run.lineage[-1]["frontier_next"],
            )
        run.rounds_done = k + 1
        k += 1
        if stop_after_round is not None and k >= stop_after_round:
            break

    if runlog is not None:
        runlog.info(
            "run_end",
            rounds_done=run.rounds_done,
            seen_total=run.seen.total(),
        )
        runlog.close()
    return run
