"""Sitemap discovery: robots Sitemap: lines -> sitemap XML fetch ->
frontier seeds; index recursion; crawl-from-sitemap end to end."""

import pyarrow as pa
import pytest

import ray


def test_parse_sitemap_urlset_and_index():
    from cex_crawler_ray.functions.sitemap import parse_sitemap

    urlset = (
        '<?xml version="1.0"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://h.test/a</loc><lastmod>2024-01-01</lastmod>"
        "</url>\n"
        "<url><loc> https://h.test/b </loc></url>\n"
        "</urlset>"
    )
    pages, nested = parse_sitemap(urlset)
    assert pages == ["https://h.test/a", "https://h.test/b"]
    assert nested == []

    index = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://h.test/sm1.xml</loc></sitemap>"
        "<sitemap><loc>https://h.test/sm2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    pages, nested = parse_sitemap(index)
    assert pages == []
    assert nested == ["https://h.test/sm1.xml", "https://h.test/sm2.xml"]


def test_robots_sitemap_line_parsed_outside_groups():
    from cex_crawler_ray.state.politeness import RobotsPolicy

    text = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://h.test/sitemap.xml\n"
        "User-agent: other\n"
        "Disallow: /x\n"
        "Sitemap: https://h.test/sitemap2.xml\n"
    )
    pol = RobotsPolicy.from_robots_txt({"h.test": text})
    assert pol.sitemaps["h.test"] == (
        "https://h.test/sitemap.xml",
        "https://h.test/sitemap2.xml",
    )
    assert pol.disallow["h.test"] == ("/private",)


@pytest.fixture(scope="module")
def sitemap_store(ray_session, sf_tiny, tmp_path_factory):
    from cex_crawler_ray.sources.page_store import PageStore
    from cex_crawler_ray.sources.pages import pages_from_documents

    ps = PageStore(
        str(tmp_path_factory.mktemp("ps_sitemap")), num_buckets=8
    )
    ps.write(pages_from_documents(sf_tiny, include_sitemaps=True))
    return ps


def test_sitemap_seeds_cover_all_articles(
    ray_session, sf_tiny, sitemap_store
):
    from cex_crawler_ray.pipelines.crawl import (
        bootstrap_robots,
        sitemap_seeds,
    )
    from cex_crawler_ray.sources.pages import (
        article_url,
        host_for,
        sources_in,
    )
    import pyarrow.parquet as pq

    sources = sources_in(sf_tiny)
    policy = bootstrap_robots(
        sitemap_store, [host_for(s) for s in sources]
    )
    assert all(host_for(s) in policy.sitemaps for s in sources)

    seeds = sitemap_seeds(sitemap_store, policy).to_pandas()
    docs = pq.read_table(
        f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    expected = {
        article_url(s, int(d))
        for d, s in zip(docs["doc_id"], docs["source"])
    }
    assert set(seeds["url"]) == expected
    assert (seeds["priority"] == 0).all()


def test_crawl_from_sitemap_seeds_fetches_allowed_articles(
    ray_session, sf_tiny, sitemap_store
):
    from cex_crawler_ray.pipelines.crawl import (
        CrawlConfig,
        bootstrap_robots,
        run_crawl,
        sitemap_seeds,
    )
    from cex_crawler_ray.sources.pages import host_for, sources_in
    from cex_crawler_ray.stages.extract import profiles_for_sources

    sources = sources_in(sf_tiny)
    policy = bootstrap_robots(
        sitemap_store, [host_for(s) for s in sources]
    )
    seeds = sitemap_seeds(sitemap_store, policy)
    n_seeds = seeds.count()

    run = run_crawl(
        sitemap_store,
        seeds,
        policy,
        CrawlConfig(
            max_rounds=30,
            profiles=profiles_for_sources(sources),
            as_of_hk="2024-03-08 09:00:00",
            offset_days=7,
        ),
    )
    fetched = run.fetched_table()["url"].to_pylist()
    # every robots-allowed sitemap url fetched exactly once; the
    # disallowed ones blocked by the crawl's own gate
    assert len(fetched) == len(set(fetched))
    blocked = sum(m.robots_blocked for m in run.metrics)
    assert len(fetched) + blocked == n_seeds


def test_allow_longest_match_precedence():
    """RFC 9309 §2.2.2: most specific rule wins; Allow wins a length
    tie.  Disallow /foo + Allow /foo/bar admits /foo/bar/x but blocks
    /foo/other."""
    from cex_crawler_ray.state.politeness import RobotsPolicy

    text = (
        "User-agent: *\n"
        "Disallow: /foo\n"
        "Allow: /foo/bar\n"
        "Disallow: /exact\n"
        "Allow: /exact\n"
    )
    pol = RobotsPolicy.from_robots_txt({"h.test": text})
    assert not pol.allowed("https://h.test/foo/other")
    assert pol.allowed("https://h.test/foo/bar/x")
    assert pol.allowed("https://h.test/foo/bar")
    # equal-length tie: Allow wins
    assert pol.allowed("https://h.test/exact")
    # longer Disallow beats shorter Allow
    pol2 = RobotsPolicy.from_robots_txt(
        {"h.test": "User-agent: *\nAllow: /a\nDisallow: /a/b\n"}
    )
    assert pol2.allowed("https://h.test/a/c")
    assert not pol2.allowed("https://h.test/a/b/c")
    # unrelated paths untouched
    assert pol.allowed("https://h.test/zzz")


def test_allow_rules_survive_bootstrap(ray_session, tmp_path):
    """Allow rules round-trip through the worker-side robots bootstrap."""
    import datetime as dt

    from cex_crawler_ray.pipelines.crawl import bootstrap_robots
    from cex_crawler_ray.sources.page_store import PageStore

    body = (
        b"User-agent: *\nDisallow: /articles/1\nAllow: /articles/12\n"
    )
    ps = PageStore(str(tmp_path / "ps_allow"), num_buckets=4)
    ps.write(
        ray.data.from_items(
            [
                {
                    "url": "https://h0.test/robots.txt",
                    "warc_ts": dt.datetime(
                        2024, 3, 1, tzinfo=dt.timezone.utc
                    ),
                    "html": body,
                    "text": "",
                    "lang": "en",
                }
            ]
        )
    )
    pol = bootstrap_robots(ps, ["h0.test"])
    assert pol.allow["h0.test"] == ("/articles/12",)
    assert not pol.allowed("https://h0.test/articles/13")
    assert pol.allowed("https://h0.test/articles/124")


def test_robots_wildcard_and_anchor_rules():
    """RFC 9309 §2.2.3: '*' matches any octet run, '$' anchors the
    end; plain prefixes keep their old semantics."""
    from cex_crawler_ray.state.politeness import RobotsPolicy

    pol = RobotsPolicy.from_robots_txt(
        {
            "h.test": (
                "User-agent: *\n"
                "Disallow: /*.pdf$\n"
                "Disallow: /tmp/*/draft\n"
                "Disallow: /exactfile$\n"
            )
        }
    )
    assert not pol.allowed("https://h.test/docs/a.pdf")
    assert pol.allowed("https://h.test/docs/a.pdfx")  # $ anchored
    assert pol.allowed("https://h.test/docs/a.html")
    assert not pol.allowed("https://h.test/tmp/x/draft")
    assert not pol.allowed("https://h.test/tmp/x/y/draftz")
    assert pol.allowed("https://h.test/tmp/x/final")
    assert not pol.allowed("https://h.test/exactfile")
    assert pol.allowed("https://h.test/exactfile2")
    # wildcard Allow overrides by rule-string length
    pol2 = RobotsPolicy.from_robots_txt(
        {
            "h.test": (
                "User-agent: *\n"
                "Disallow: /dl\n"
                "Allow: /dl/*.txt$\n"
            )
        }
    )
    assert not pol2.allowed("https://h.test/dl/a.bin")
    assert pol2.allowed("https://h.test/dl/a.txt")


def test_sitemap_seeds_empty_policy_keeps_schema(
    ray_session, sitemap_store
):
    """No-sitemaps fallback must carry the real (url, priority) schema
    — a zero-block from_items([]) dataset has schema None and breaks
    consumers that inspect seed columns."""
    from cex_crawler_ray.pipelines.crawl import sitemap_seeds
    from cex_crawler_ray.state.politeness import RobotsPolicy

    seeds = sitemap_seeds(sitemap_store, RobotsPolicy())
    schema = seeds.schema()
    assert schema is not None
    assert schema.names == ["url", "priority"]
    assert seeds.count() == 0
