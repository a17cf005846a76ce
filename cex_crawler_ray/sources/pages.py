"""The simulated web: a deterministic `pages` table derived from the
driver's ``documents`` parquet.

BASELINE.json ``input_hint`` fixes the page-store shape:
``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``.  No external data: every page is a pure function of a
``documents`` row (doc_id, text, lang, source), so the DuckDB oracle can
recompute every expected value with SQL over the same table.

Layout of the synthetic web (per host ``{source}.test``):

* one hub page ``https://{host}/hub`` linking (relative hrefs) to all of
  the host's articles — frontier-discovery input, mirroring the
  reference's announcement list pages
  (reference ``exchange/weex.py:30-60``),
* one article page per document at ``/articles/{doc_id}`` whose HTML
  profile rotates by source index: profile 0 = whole-page variant A
  extraction, profile 1 = ``div.article-body`` root + variant B
  (reference ``exchange/bingx.py:243-252``), profile 2 =
  ``div.article-content`` root + variant B
  (reference ``exchange/bitunix.py:96-106``).

The announcement body text is the document text plus a deterministic
decoration (listing / delisting keywords, one trading-pair symbol, an
optional date) chosen by ``doc_id`` so the fallback analyzer
(functions/analyzer.py) produces SQL-predictable records.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

import ray

from ..schemas import PAGES

SYMBOLS = ["BTC/USDT", "ETH-USDT", "AAA/BBB", "XRP/USDT", "DOT-USDT"]
DATE_STR = "2024-03-15"
BASE_TS = _dt.datetime(2024, 3, 1, 0, 0, 0, tzinfo=_dt.timezone.utc)


def src_num(source: str) -> int:
    return int(source[3:])  # 'src12' -> 12


def host_for(source: str) -> str:
    return f"{source}.test"


def article_url(source: str, doc_id: int) -> str:
    return f"https://{host_for(source)}/articles/{doc_id}"


def hub_url(source: str) -> str:
    return f"https://{host_for(source)}/hub"


def title_for(doc_id: int, lang: str) -> str:
    return f"Doc {doc_id} {lang}"


def warc_ts_for(doc_id: int) -> _dt.datetime:
    return BASE_TS + _dt.timedelta(minutes=int(doc_id))


def ann_text(doc_id: int, text: str, pad: int = 1) -> str:
    """Deterministic announcement decoration (analyzer conformance input).

    ``pad`` repeats the body text (bench-only: realistic page sizes);
    the decoration appears once so analyzer semantics are unchanged."""
    if pad > 1:
        text = " ".join([text] * pad)
    sym = SYMBOLS[doc_id % 5]
    date = f" on {DATE_STR}" if doc_id % 2 == 0 else ""
    m = doc_id % 4
    if m == 0:
        return f"{text} 上架 {sym}{date}"
    if m == 1:
        return f"{text} delisting {sym}{date}"
    if m == 2:
        return f"{text} listing {sym} 合约{date}"
    return text


def expected_extracted_text(
    doc_id: int, lang: str, source: str, text: str, pad: int = 1
) -> str:
    """Oracle text for the `text` column: what extraction must reproduce
    byte-identically (profile 0 -> variant A newline join, else variant B
    space join)."""
    title = title_for(doc_id, lang)
    body = ann_text(doc_id, text, pad)
    if src_num(source) % 3 == 0:
        return f"{title}\n{body}"
    return f"{title} {body}"


def article_html(
    doc_id: int, lang: str, source: str, text: str, pad: int = 1
) -> str:
    title = title_for(doc_id, lang)
    body = ann_text(doc_id, text, pad)
    if src_num(source) % 4 == 3:
        # JSON detail page: hosts whose hubs are __NEXT_DATA__ (m4==3)
        # also serve their ARTICLES as Next.js JSON blobs — the
        # reference's bybit detail layout
        # (props.pageProps.articleDetail.content.json.children with a
        # type filter, exchange/bybit.py:81-102); the img node is a
        # decoy the type=='p' filter must skip
        import json as _json

        payload = _json.dumps(
            {
                "props": {
                    "pageProps": {
                        "articleDetail": {
                            "title": title,
                            "content": {
                                "json": {
                                    "children": [
                                        {
                                            "type": "p",
                                            "children": [{"text": body}],
                                        },
                                        {
                                            "type": "img",
                                            "src": "banner.png",
                                        },
                                    ]
                                }
                            },
                        }
                    }
                }
            },
            ensure_ascii=False,
        )
        return (
            "<html><head>"
            '<script id="__NEXT_DATA__" type="application/json">'
            + payload
            + "</script></head><body>\n<div>loading…</div>\n</body></html>"
        )
    profile = src_num(source) % 3
    if profile == 0:
        # whole-page extraction, variant A; script/style are decomposed.
        return (
            "<html><head><script>var page={};</script>"
            "<style>.x{color:red}</style></head><body>\n"
            f"<h1>{title}</h1>\n<p>{body}</p>\n"
            "</body></html>"
        )
    root_class = "article-body" if profile == 1 else "article-content"
    # nav/header/footer noise is decomposed by variant B; the content
    # root confines extraction to the article subtree.
    return (
        "<html><head><script>var page={};</script></head><body>\n"
        "<nav>site nav links</nav>\n<header>site header</header>\n"
        f'<div class="{root_class}">\n<h1>{title}</h1>\n<p>{body}</p>\n</div>\n'
        "<footer>site footer</footer>\n</body></html>"
    )


def hub_html(source: str, doc_ids, langs) -> str:
    """Hub (announcement-list) page.  Payload shape rotates by source so
    the crawl exercises every reference list-API style (SURVEY §2.1):

    * default: HTML ``<a>`` link list (zendesk-style hubs,
      reference ``exchange/weex.py:30-60``),
    * source index % 4 == 1: ``<pre>``-wrapped JSON API response
      (reference ``exchange/mexc.py:29-42`` / ``coinex.py:30-43``),
    * source index % 4 == 3: ``__NEXT_DATA__`` script JSON
      (reference ``exchange/bybit.py:54-78`` / ``gate.py:19-43``).
    """
    import json as _json

    m = src_num(source) % 4
    entries = [
        {"href": f"/articles/{d}", "title": title_for(d, l)}
        for d, l in zip(doc_ids, langs)
    ]
    if m == 1:
        payload = _json.dumps({"data": entries}, ensure_ascii=False)
        return (
            "<html><body>\n<pre>" + payload + "</pre>\n</body></html>"
        )
    if m == 3:
        payload = _json.dumps(
            {"props": {"pageProps": {"articles": entries}}}, ensure_ascii=False
        )
        return (
            "<html><head>"
            '<script id="__NEXT_DATA__" type="application/json">'
            + payload
            + "</script></head><body>\n<h2>Announcements</h2>\n</body></html>"
        )
    items = "\n".join(
        f'<li><a href="{e["href"]}">{e["title"]}</a></li>' for e in entries
    )
    return (
        "<html><body>\n<h2>Announcements</h2>\n<ul>\n" + items + "\n</ul>\n"
        "</body></html>"
    )


def robots_rules(sources) -> dict:
    """host -> list of disallowed path prefixes.  Deterministic and
    SQL-replicable: every host with source index % 5 == 4 disallows
    article paths whose doc_id starts with '1'.  (The reference obeys no
    robots at all — this is the north_rule's added capability.)"""
    rules = {}
    for s in sources:
        if src_num(s) % 5 == 4:
            rules[host_for(s)] = ["/articles/1"]
        else:
            rules[host_for(s)] = []
    return rules


def crawl_delay_ms_for(source: str, base_ms: int = 500) -> int:
    """Deterministic per-host crawl delay (source index % 3 scales the
    base): the value published in the host's robots.txt AND assumed by
    the flagship politeness budget — one rule, two consumers."""
    return base_ms * (1 + src_num(source) % 3)


def robots_txt_url(source: str) -> str:
    return f"https://{host_for(source)}/robots.txt"


def robots_txt_for(
    source: str, delay_ms: int | None = None, sitemap: bool = False
) -> str:
    """The host's /robots.txt BODY — the standard-format rendering of
    ``robots_rules`` (+ an optional Crawl-delay), so a crawl that
    FETCHES and parses robots.txt recovers exactly the policy the
    oracle assumes.  ``sitemap=True`` appends the host's ``Sitemap:``
    line (sitemaps.org protocol; outside the user-agent group)."""
    lines = ["User-agent: *"]
    for p in robots_rules([source]).get(host_for(source), []):
        lines.append(f"Disallow: {p}")
    if delay_ms is not None:
        lines.append(f"Crawl-delay: {delay_ms / 1000:g}")
    if sitemap:
        lines.append(f"Sitemap: {sitemap_url(source)}")
    return "\n".join(lines) + "\n"


def sitemap_url(source: str) -> str:
    return f"https://{host_for(source)}/sitemap.xml"


def sitemap_xml_for(source: str, doc_ids) -> str:
    """Standard sitemaps.org urlset for the host's articles (loc +
    lastmod from the deterministic warc clock)."""
    rows = []
    for d in doc_ids:
        rows.append(
            "  <url>\n"
            f"    <loc>{article_url(source, int(d))}</loc>\n"
            f"    <lastmod>{warc_ts_for(int(d)).strftime('%Y-%m-%d')}"
            "</lastmod>\n"
            "  </url>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "\n".join(rows)
        + "\n</urlset>\n"
    )


def _article_batch(batch: pa.Table, pad: int = 1) -> pa.Table:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang, source in zip(
        batch["doc_id"].to_pylist(),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["source"].to_pylist(),
    ):
        urls.append(article_url(source, doc_id))
        tss.append(warc_ts_for(doc_id))
        htmls.append(
            article_html(doc_id, lang, source, text, pad).encode("utf-8")
        )
        texts.append(
            expected_extracted_text(doc_id, lang, source, text, pad)
        )
        langs.append(lang)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us", tz="UTC")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES,
    )


def _hub_group(batch: pa.Table, include_sitemaps: bool = False) -> pa.Table:
    source = batch["source"][0].as_py()
    order = pa.compute.sort_indices(batch["doc_id"])
    doc_ids = pa.compute.take(batch["doc_id"], order).to_pylist()
    langs = pa.compute.take(batch["lang"], order).to_pylist()
    html = hub_html(source, doc_ids, langs).encode("utf-8")
    robots = robots_txt_for(
        source,
        delay_ms=crawl_delay_ms_for(source),
        sitemap=include_sitemaps,
    ).encode("utf-8")
    urls = [hub_url(source), robots_txt_url(source)]
    bodies = [html, robots]
    if include_sitemaps:
        urls.append(sitemap_url(source))
        bodies.append(sitemap_xml_for(source, doc_ids).encode("utf-8"))
    n = len(urls)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array([BASE_TS] * n, pa.timestamp("us", tz="UTC")),
            pa.array(bodies, pa.binary()),
            pa.array([""] * n, pa.string()),
            pa.array(["en"] * n, pa.string()),
        ],
        schema=PAGES,
    )


def pages_from_documents(
    sf_dir: str,
    include_hubs: bool = True,
    replicate: int = 1,
    pad: int = 1,
    max_doc_id: int | None = None,
    include_sitemaps: bool = False,
) -> "ray.data.Dataset":
    """Synthesize the `pages` Dataset from ``{sf_dir}/documents.parquet``.

    ``replicate > 1`` tiles the articles with distinct urls
    (``/articles/{doc_id}?copy={i}``) for bench-scale inputs; copies keep
    identical html/text so extraction cost scales linearly.
    ``max_doc_id`` restricts the web to older documents — the smaller
    snapshot of a growing site, for incremental-recrawl tests (hubs list
    only the present articles, like a real list API at an earlier tick).
    """
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    if max_doc_id is not None:

        def cutoff(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.less(batch["doc_id"], max_doc_id))

        docs = docs.map_batches(cutoff, batch_format="pyarrow")
    articles = docs.map_batches(
        lambda b, _p=pad: _article_batch(b, _p), batch_format="pyarrow"
    )
    if replicate > 1:

        def _tile(batch: pa.Table) -> pa.Table:
            tables = [batch]
            for i in range(1, replicate):
                suffix = pa.array(
                    [f"?copy={i}"] * batch.num_rows, pa.string()
                )
                urls = pa.compute.binary_join_element_wise(
                    batch["url"].combine_chunks(), suffix, ""
                )
                tables.append(batch.set_column(0, "url", urls))
            return pa.concat_tables(tables)

        articles = articles.map_batches(_tile, batch_format="pyarrow")
    if not include_hubs:
        return articles
    hubs = docs.groupby("source").map_groups(
        lambda b, _s=include_sitemaps: _hub_group(b, _s),
        batch_format="pyarrow",
    )
    return articles.union(hubs)


def seeds_for_sources(sources, priority: int = 0) -> "ray.data.Dataset":
    """Seed frontier: one hub url per host (the reference's per-exchange
    list endpoints, reference ``main.py:159-174``)."""
    rows = [
        {"url": hub_url(s), "priority": priority} for s in sorted(set(sources))
    ]
    return ray.data.from_items(rows)


def sources_in(sf_dir: str) -> list:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
    return sorted(set(t["source"].to_pylist()), key=src_num)
