"""End-to-end crawl over the synthetic web (SURVEY.md §7.1 steps 2-5).

Covers: page-store bucket join fetch, seen-filter admission, politeness
scheduling determinism, link discovery, extraction byte-identity vs the
pages.text oracle column, tombstones, and resume-without-refetch.
"""

import os

import pyarrow.compute as pc
import pytest

import ray

from cex_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from cex_crawler_ray.sources.page_store import PageStore
from cex_crawler_ray.sources.pages import (
    pages_from_documents,
    robots_rules,
    seeds_for_sources,
    sources_in,
)
from cex_crawler_ray.stages.extract import profiles_for_sources
from cex_crawler_ray.state.politeness import RobotsPolicy


@pytest.fixture(scope="module")
def store(ray_session, sf_tiny, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pagestore"))
    ps = PageStore(path, num_buckets=8)
    ps.write(pages_from_documents(sf_tiny))
    return ps


@pytest.fixture(scope="module")
def crawl_inputs(sf_tiny):
    sources = sources_in(sf_tiny)
    robots = RobotsPolicy(
        disallow=robots_rules(sources),
        default_delay_ms=500,  # 20 tokens / 10s round
    )
    cfg = CrawlConfig(
        max_rounds=6,
        seen_shards=4,
        profiles=profiles_for_sources(sources),
        as_of_hk="2024-03-08 09:00:00",
        offset_days=7,  # cutoff 2024-03-01 09:00:00 HK -> doc_id < 60 tombstone
    )
    return sources, robots, cfg


def _expected_seen(sf_tiny, sources):
    import pyarrow.parquet as pq

    from cex_crawler_ray.sources.pages import (
        article_url,
        hub_url,
        src_num,
    )

    docs = pq.read_table(
        f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
    )
    seen = {hub_url(s) for s in sources}
    for doc_id, source in zip(
        docs["doc_id"].to_pylist(), docs["source"].to_pylist()
    ):
        seen.add(article_url(source, doc_id))
    return seen


def _allowed_articles(sf_tiny, sources):
    import pyarrow.parquet as pq

    from cex_crawler_ray.sources.pages import article_url, src_num

    docs = pq.read_table(
        f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
    )
    urls = set()
    for doc_id, source in zip(
        docs["doc_id"].to_pylist(), docs["source"].to_pylist()
    ):
        if src_num(source) % 5 == 4 and str(doc_id).startswith("1"):
            continue  # robots-disallowed
        urls.add(article_url(source, doc_id))
    return urls


def test_crawl_end_to_end(store, crawl_inputs, sf_tiny):
    sources, robots, cfg = crawl_inputs
    run = run_crawl(store, seeds_for_sources(sources), robots, cfg)

    fetched = run.fetched_table()
    extracted = run.extracted_table()

    # every fetch hit the store (simulated web has no dead links)
    assert pc.all(pc.equal(fetched["status"], 200)).as_py()

    # URL-seen set == hubs + all discovered articles (robots blocks
    # fetches, not admission — blocked urls are still "seen")
    expected_seen = _expected_seen(sf_tiny, sources)
    assert run.seen_set_size() == len(expected_seen)

    # fetched set == hubs + robots-allowed articles, each exactly once
    allowed = _allowed_articles(sf_tiny, sources)
    fetched_urls = fetched["url"].to_pylist()
    assert len(fetched_urls) == len(set(fetched_urls)), "a url fetched twice"
    art = [u for u in fetched_urls if "/articles/" in u]
    assert set(art) == allowed

    # extraction is byte-identical to the pages.text oracle column
    import pyarrow.parquet as pq

    oracle = {}
    import glob as _glob

    for f in _glob.glob(f"{store.path}/bucket=*/*.parquet"):
        t = pq.read_table(f, columns=["url", "text"])
        oracle.update(zip(t["url"].to_pylist(), t["text"].to_pylist()))
    ok = extracted.filter(pc.equal(extracted["status"], "ok"))
    mismatches = [
        (u, txt, oracle[u])
        for u, txt in zip(ok["url"].to_pylist(), ok["text"].to_pylist())
        if u in oracle and "/articles/" in u and oracle[u] != txt
    ]
    assert mismatches == [], mismatches[:3]

    # tombstones: articles with HK release_time < cutoff (doc_id < 60)
    tombs = extracted.filter(pc.equal(extracted["status"], "tombstone"))
    tomb_ids = {
        int(u.rsplit("/", 1)[-1])
        for u in tombs["url"].to_pylist()
        if "/articles/" in u
    }
    exp_tombs = {
        int(u.rsplit("/", 1)[-1]) for u in allowed
    } & set(range(60))
    assert tomb_ids == exp_tombs


def test_crawl_order_deterministic(store, crawl_inputs):
    sources, robots, cfg = crawl_inputs
    run1 = run_crawl(store, seeds_for_sources(sources), robots, cfg)
    run2 = run_crawl(store, seeds_for_sources(sources), robots, cfg)
    o1, o2 = run1.crawl_order(), run2.crawl_order()
    assert o1 == o2
    assert len(o1) > 0


def test_politeness_budget_defers(store, crawl_inputs):
    sources, robots, cfg = crawl_inputs
    # tight budget: 2 fetches per host per round
    tight = RobotsPolicy(
        disallow=robots_rules(sources), default_delay_ms=5000
    )
    cfg_tight = CrawlConfig(
        max_rounds=30,
        seen_shards=4,
        profiles=cfg.profiles,
        as_of_hk=cfg.as_of_hk,
        offset_days=cfg.offset_days,
    )
    run = run_crawl(store, seeds_for_sources(sources), tight, cfg_tight)
    fetched = run.fetched_table()
    # no (host, round) exceeds the 2-token budget
    import collections

    counts = collections.Counter(
        zip(fetched["host"].to_pylist(), fetched["fetch_round"].to_pylist())
    )
    assert max(counts.values()) <= 2
    # the tight crawl still converges to the same fetched set
    loose = run_crawl(store, seeds_for_sources(sources), robots, cfg)
    assert set(fetched["url"].to_pylist()) == set(
        loose.fetched_table()["url"].to_pylist()
    )


def test_resume_no_refetch(store, crawl_inputs, tmp_path):
    sources, robots, cfg = crawl_inputs
    ckpt = str(tmp_path / "ckpt")

    # full uninterrupted run (no checkpoint) as the oracle
    full = run_crawl(store, seeds_for_sources(sources), robots, cfg)

    # crash after round 1, then resume
    part = run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        cfg,
        checkpoint_dir=ckpt,
        stop_after_round=1,
    )
    fetched_before = part.fetched_table().num_rows
    resumed = run_crawl(
        store, seeds_for_sources(sources), robots, cfg, checkpoint_dir=ckpt
    )
    # the resumed run re-fetches nothing from round 0
    urls_full = sorted(full.fetched_table()["url"].to_pylist())
    urls_resumed = sorted(resumed.fetched_table()["url"].to_pylist())
    assert urls_resumed == urls_full
    assert resumed.metrics[0].scheduled == full.metrics[0].scheduled
    # second process only fetched the remainder (rows in rounds that ran
    # after the crash point)
    import pyarrow.compute as _pc

    remainder = len(urls_full) - fetched_before
    ft = resumed.fetched_table()
    refetched = ft.filter(
        _pc.greater_equal(ft["fetch_round"], part.rounds_done)
    ).num_rows
    assert refetched == remainder
    # crawl order identical to the uninterrupted run
    assert resumed.crawl_order() == full.crawl_order()


def test_resume_purges_uncommitted_round_outputs(
    store, crawl_inputs, tmp_path
):
    """A crash AFTER a round's write_parquet but BEFORE the manifest
    commit leaves stale UUID-named files; resume must purge them or the
    round re-run appends a second copy and pages duplicate."""
    import shutil

    sources, robots, cfg = crawl_inputs
    ckpt = str(tmp_path / "ckpt")
    full = run_crawl(store, seeds_for_sources(sources), robots, cfg)
    part = run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        cfg,
        checkpoint_dir=ckpt,
        stop_after_round=1,
    )
    assert part.rounds_done == 1
    # plant what an uncommitted round=1 crash would leave behind:
    # a round dir full of parquet, plus stale seed/reseed-clean files
    # (synthesized — auto_compact already GC'd the consumed originals)
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.copytree(
        os.path.join(ckpt, "round=0"), os.path.join(ckpt, "round=1")
    )
    stale_tbl = pa.table({"url": pa.array(["https://stale.test/x"])})
    pq.write_table(stale_tbl, os.path.join(ckpt, "seeds-r1.parquet"))
    os.makedirs(os.path.join(ckpt, "reseed_clean-r1"))
    pq.write_table(
        stale_tbl, os.path.join(ckpt, "reseed_clean-r1", "stale.parquet")
    )
    resumed = run_crawl(
        store, seeds_for_sources(sources), robots, cfg, checkpoint_dir=ckpt
    )
    # stale artifacts are gone and nothing was double-counted
    assert not os.path.exists(os.path.join(ckpt, "seeds-r1.parquet"))
    assert not os.path.exists(os.path.join(ckpt, "reseed_clean-r1"))
    urls = resumed.fetched_table()["url"].to_pylist()
    assert len(urls) == len(set(urls))
    assert sorted(urls) == sorted(full.fetched_table()["url"].to_pylist())
    assert resumed.crawl_order() == full.crawl_order()


def test_resume_legacy_manifest_without_frontier_key(
    store, crawl_inputs, tmp_path
):
    """Checkpoints written by the pre-path-list format (no 'frontier'
    key; frontier_next.parquet in the last round dir) must resume, not
    KeyError."""
    import json as _json

    sources, robots, cfg = crawl_inputs
    ckpt = str(tmp_path / "ckpt")
    full = run_crawl(store, seeds_for_sources(sources), robots, cfg)
    run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        cfg,
        checkpoint_dir=ckpt,
        stop_after_round=1,
    )
    mpath = os.path.join(ckpt, "manifest.json")
    with open(mpath) as f:
        manifest = _json.load(f)
    del manifest["frontier"]
    with open(mpath, "w") as f:
        _json.dump(manifest, f)
    assert os.path.exists(
        os.path.join(ckpt, "round=0", "frontier_next.parquet")
    )
    resumed = run_crawl(
        store, seeds_for_sources(sources), robots, cfg, checkpoint_dir=ckpt
    )
    assert resumed.crawl_order() == full.crawl_order()


def test_fetch_grouped_modes_match_aligned(store, crawl_inputs):
    """Both fused-fetch modes (coalesced map_batches and
    groupby(bucket)) resolve the same rows as the materialized
    bucket-aligned fetch."""
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import canonicalize_batch
    from cex_crawler_ray.sources.pages import seeds_for_sources

    sources, _, _ = crawl_inputs
    seed_tbl = pa.concat_tables(
        [pa.table(b) for b in seeds_for_sources(sources).iter_batches(
            batch_format="pyarrow"
        )]
    )
    frontier = canonicalize_batch(seed_tbl)

    def rows(ds):
        df = ds.to_pandas()
        return sorted(
            zip(df["url"], df["status"], df["html"].isna())
        )

    aligned = rows(store.fetch_aligned(frontier))
    assert len(aligned) == frontier.num_rows
    fused = rows(store.fetch_grouped(ray.data.from_arrow(frontier)))
    grouped = rows(
        store.fetch_grouped(ray.data.from_arrow(frontier), grouped=True)
    )
    assert fused == aligned
    assert grouped == aligned


def test_title_filter_applied_in_frontier():
    """M12: on filtered hosts only matching anchor titles enter the
    frontier (vectorized substring keep, reference lbank.py:179-184)."""
    import numpy as np
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import (
        apply_title_filters,
        canonicalize_batch,
    )

    links = pa.table(
        {
            "url": pa.array(
                [
                    "https://f.test/articles/1",
                    "https://f.test/articles/2",
                    "https://open.test/articles/3",
                ]
            ),
            "title": pa.array(["Doc 1 en", "Doc 2 de", "Doc 3 de"]),
            "priority": pa.array([0, 0, 0], pa.int32()),
            "depth": pa.array([1, 1, 1], pa.int32()),
        }
    )
    canon = canonicalize_batch(links, round_no=1)
    out = apply_title_filters(canon, {"f.test": (" en",)})
    urls = out["url"].to_pylist()
    # f.test filtered to en titles; unfiltered hosts untouched
    assert urls == [
        "https://f.test/articles/1",
        "https://open.test/articles/3",
    ]
    # no filters -> identity
    assert apply_title_filters(canon, {}).num_rows == 3


def test_robots_txt_parser():
    """RobotsPolicy.from_robots_txt: UA group matching, disallow
    prefixes, crawl-delay, comments, unknown directives."""
    from cex_crawler_ray.state.politeness import RobotsPolicy

    txt = """
# comments ignored
User-agent: *
Disallow: /private/
Disallow: /tmp
Crawl-delay: 2
Sitemap: https://h.test/sitemap.xml

User-agent: otherbot
Disallow: /
"""
    pol = RobotsPolicy.from_robots_txt({"h.test": txt, "open.test": ""})
    assert not pol.allowed("https://h.test/private/x")
    assert not pol.allowed("https://h.test/tmpfile")  # prefix semantics
    assert pol.allowed("https://h.test/public")
    assert pol.allowed("https://open.test/anything")
    assert pol.crawl_delay_ms["h.test"] == 2000
    assert pol.tokens_per_round("h.test", 10_000) == 5
    # agent-specific group wins over *
    pol2 = RobotsPolicy.from_robots_txt(
        {"h.test": txt}, user_agent="otherbot"
    )
    assert not pol2.allowed("https://h.test/anything")
    assert pol.hosts_with_rules() == frozenset({"h.test"})


def test_robots_txt_rfc9309_groups():
    """RFC 9309 group semantics: consecutive User-agent lines share the
    following rules; a matched specific-agent group wins ENTIRELY over
    '*' even when the specific group has no rules (allow-all)."""
    from cex_crawler_ray.state.politeness import RobotsPolicy

    txt = """
User-agent: abot
User-agent: bbot
Disallow: /shared/

User-agent: *
Disallow: /everything/
Crawl-delay: 9
"""
    # consecutive UA lines form ONE group: both agents get /shared/
    for agent in ("abot", "bbot"):
        pol = RobotsPolicy.from_robots_txt({"h.test": txt}, user_agent=agent)
        assert not pol.allowed("https://h.test/shared/x")
        assert pol.allowed("https://h.test/everything/x")  # star ignored
        assert "h.test" not in pol.crawl_delay_ms  # star delay ignored
    # unmatched agent falls back to the star group
    pol = RobotsPolicy.from_robots_txt({"h.test": txt}, user_agent="cbot")
    assert not pol.allowed("https://h.test/everything/x")
    assert pol.allowed("https://h.test/shared/x")
    assert pol.crawl_delay_ms["h.test"] == 9000
    # a matched specific group with NO rules means allow-all, not
    # fall-back-to-star
    txt2 = """
User-agent: emptybot
Disallow:

User-agent: *
Disallow: /blocked/
"""
    pol = RobotsPolicy.from_robots_txt({"h.test": txt2}, user_agent="emptybot")
    assert pol.allowed("https://h.test/blocked/x")
    # same-agent groups merge
    txt3 = """
User-agent: abot
Disallow: /a/

User-agent: abot
Disallow: /b/
"""
    pol = RobotsPolicy.from_robots_txt({"h.test": txt3}, user_agent="abot")
    assert not pol.allowed("https://h.test/a/x")
    assert not pol.allowed("https://h.test/b/x")


def test_canonical_fast_path_rejects_control_chars():
    """URLs containing tab/CR/LF must NOT take the regex fast path:
    urlsplit strips those chars, so the canonical form differs from the
    raw string and both must hash identically via the slow path."""
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import canonicalize_batch

    dirty = "https://h.test/a\tb/c"
    clean = "https://h.test/ab/c"
    out = canonicalize_batch(pa.table({"url": [dirty, clean]}))
    assert out["url"].to_pylist() == [clean, clean]
    assert out["url_hash"][0].as_py() == out["url_hash"][1].as_py()


def test_robots_keep_mask_short_circuit():
    import numpy as np
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import (
        _robots_keep_mask,
        canonicalize_batch,
    )
    from cex_crawler_ray.state.politeness import RobotsPolicy

    links = pa.table(
        {
            "url": pa.array(
                [
                    "https://ruled.test/articles/1",
                    "https://ruled.test/blocked/2",
                    "https://free.test/blocked/3",
                ]
            )
        }
    )
    tbl = canonicalize_batch(links)
    pol = RobotsPolicy(disallow={"ruled.test": ["/blocked"]})
    mask = _robots_keep_mask(tbl, pol)
    # only the ruled host's matching path is blocked; free.test passes
    # even though its path matches the pattern (host-scoped rules)
    assert mask.tolist() == [True, False, True]
    # no rules at all -> all-true without touching urls
    assert _robots_keep_mask(tbl, RobotsPolicy()).all()


def test_priority_orders_schedule(store, crawl_inputs):
    """Lower priority value fetches first within a host's budget (the
    north-star's priority frontier)."""
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import _schedule_driver

    tbl = pa.table(
        {
            "url": pa.array([f"https://h.test/p{i}" for i in range(6)]),
            "host": pa.array(["h.test"] * 6),
            "url_hash": pa.array(list(range(6)), pa.uint64()),
            "title": pa.array([""] * 6),
            "priority": pa.array([2, 0, 1, 0, 2, 1], pa.int32()),
            "depth": pa.array([0] * 6, pa.int32()),
            "discovered_ts": pa.array([0] * 6, pa.int64()),
        }
    )
    out = _schedule_driver(tbl, {"h.test": 2}, 2).to_pandas()
    sched = out[out["scheduled"]].sort_values("fetch_slot")
    assert sched["priority"].tolist() == [0, 0]
    assert set(sched["url_hash"]) == {1, 3}


def test_bootstrap_robots_roundtrip(store, crawl_inputs, sf_tiny):
    """Fetching + parsing the synthetic /robots.txt bodies recovers
    exactly the policy the oracle assumes (rules AND crawl delays)."""
    from cex_crawler_ray.pipelines.crawl import bootstrap_robots
    from cex_crawler_ray.pipelines.flagship import (
        DEFAULT_DELAY_MS,
        crawl_delays_for,
    )
    from cex_crawler_ray.sources.pages import host_for

    sources, robots, _ = crawl_inputs
    boot = bootstrap_robots(
        store,
        [host_for(s) for s in sources],
        default_delay_ms=DEFAULT_DELAY_MS,
    )
    expected_rules = robots_rules(sources)
    for s in sources:
        h = host_for(s)
        assert list(boot.disallow.get(h, [])) == expected_rules[h], h
    assert boot.crawl_delay_ms == crawl_delays_for(sources)
    # a url blocked by the constructed policy is blocked by the
    # bootstrapped one
    for s in sources:
        u = f"https://{host_for(s)}/articles/12"
        assert boot.allowed(u) == robots.allowed(u), u


def test_discover_trap_guards(ray_session):
    """Binary-extension links, over-long urls and repeated-segment
    loop traps are dropped at discovery; normal article links pass."""
    import pyarrow as pa

    from cex_crawler_ray.pipelines.crawl import DiscoverStage

    long_url = "/deep/" + "x" * 3000
    html = (
        "<html><body>"
        '<a href="/articles/5">ok</a>'
        '<a href="/img/logo.PNG">img</a>'
        '<a href="/img/photo.png#gallery">img-frag</a>'
        '<a href="/styles/site.css?v=2">css</a>'
        f'<a href="{long_url}">long</a>'
        '<a href="/a/b/a/b/a/b/page">loop</a>'
        '<a href="/a/b/c/page">fine</a>'
        "</body></html>"
    ).encode("utf-8")
    batch = pa.table(
        {
            "url": pa.array(["https://h0.test/hub"], pa.string()),
            "html": pa.array([html], pa.binary()),
            "status": pa.array([200], pa.int32()),
            "priority": pa.array([0], pa.int32()),
            "depth": pa.array([0], pa.int32()),
        }
    )
    urls = DiscoverStage()(batch)["url"].to_pylist()
    assert "https://h0.test/articles/5" in urls
    assert "https://h0.test/a/b/c/page" in urls
    assert not any(".png" in u.lower() or ".css" in u.lower() for u in urls)
    assert not any(len(u) > 2048 for u in urls)
    assert not any("/a/b/a/b/a/b/" in u for u in urls)
