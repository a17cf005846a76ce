"""Real-exchange profile data pack — the reference crawler's 15 sites
as declarative profile DATA.

The engine's mechanisms (list-API discovery, __NEXT_DATA__ parsing,
buildId caching, md5 id derivation, HK timestamp normalization,
extraction variants A/B, content-root selection) were all proven on a
synthetic web; this module supplies the per-site knowledge the
reference hardcodes in ``exchange/*.py`` so a user of the reference
can point THIS engine at the same 15 sites.  Every field cites its
reference source line.  Conformance is pinned by
``tests/test_real_profiles.py``, which replays the reference's ~490
committed golden output JSONs (``/root/reference/output/``) through
these rules: url-template reconstruction, id derivation, timestamp
format, record/tombstone schema, and analyzer flatten round-trips all
match byte-for-byte.

Discovery kinds:

* ``list_api``     — GET a JSON list endpoint (binance/upbit/btcc/coinex/mexc)
* ``search_api``   — POST a search index (bybit)
* ``next_data``    — scrape ``buildId`` then GET ``_next/data`` lists (gate/bitget)
* ``hub_links``    — parse hub-page ``<a>`` link lists (weex/bitunix/blofin/bingx/lbank/okx/bithumb)

Detail transports:

* ``page_html``    — fetch the page, extract text from HTML (binance/okx/weex/bitunix/blofin/bingx)
* ``json_api``     — GET a JSON endpoint, assemble text from fields (gate/mexc/bitget/bithumb/lbank/upbit)
* ``next_data``    — parse the page's __NEXT_DATA__ articleDetail (bybit)
* ``list_payload`` — text ships inside the list item itself (btcc ``content``, coinex ``body``)
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from cex_crawler_ray.functions import html_text, timefmt
from cex_crawler_ray.stages.extract import ExtractProfile


@dataclass(frozen=True)
class RealExchangeProfile:
    name: str
    base_url: str
    # frontier discovery ----------------------------------------------
    discovery: str  # 'list_api' | 'search_api' | 'next_data' | 'hub_links'
    discovery_urls: tuple = ()  # templates; {build_id}/{section_id} slots
    catalogs: tuple = ()  # per-site category/catalog ids unioned (A11)
    title_filters: tuple = ()  # frontier keep-if-title-contains terms (M12)
    needs_build_id: bool = False  # T3 buildId cache applies
    # identity + urls -------------------------------------------------
    id_rule: str = "site"  # 'site' | 'md5_url' | 'md5_rel_url'
    id_field: str | None = None  # list-item field holding the site id
    record_url_template: str | None = None  # '{id}' slot; None -> url IS full_url
    url_prefix: str = ""  # md5_rel_url: full_url = prefix + relative
    # release time ----------------------------------------------------
    ts_field: str | None = None  # list-item (or detail) field
    ts_encoding: str = "iso"  # 'ms' | 's' | 'iso' | 'time_attr' | 'detail'
    # detail transport + text assembly --------------------------------
    detail_kind: str = "page_html"
    detail_url_template: str | None = None  # {id}/{build_id} slots
    content_paths: tuple = ()  # json paths assembled by detail_text()
    # HTML extraction profile (M1-M3) ---------------------------------
    extract_variant: str = "a"
    root_tag: str | None = None
    root_class: str | None = None
    hosts: tuple = ()  # hosts whose pages this profile extracts
    # faithfully-documented reference quirks --------------------------
    quirks: tuple = ()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


REAL_EXCHANGES: dict[str, RealExchangeProfile] = {
    # reference exchange/binance.py
    "binance": RealExchangeProfile(
        name="binance",
        base_url="https://www.binance.com",  # binance.py:25
        discovery="list_api",
        # catalogId=161 delistings + catalogId=48 listings, concatenated
        # (binance.py:75, binance.py:223-225)
        discovery_urls=(
            "https://www.binance.com/bapi/apex/v1/public/apex/cms/article/"
            "list/query?type=1&pageNo=1&pageSize=20&catalogId={catalog}",
        ),
        catalogs=("161", "48"),
        id_rule="site",
        id_field="code",  # binance.py:235
        record_url_template=(
            "https://www.binance.com/zh-CN/support/announcement/detail/{id}"
        ),  # binance.py:277
        ts_field="releaseDate",
        ts_encoding="ms",  # binance.py:238-239
        detail_kind="page_html",  # binance.py:174-212 (whole page)
        detail_url_template=(
            "https://www.binance.com/zh-CN/support/announcement/detail/{id}"
        ),
        extract_variant="a",  # parse_announcement_content, base_scraper.py:271-285
        hosts=("www.binance.com",),
    ),
    # reference exchange/bingx.py
    "bingx": RealExchangeProfile(
        name="bingx",
        base_url="https://www.bingx.com",  # bingx.py:24
        discovery="hub_links",  # announcement hubs + listArticles intercept
        discovery_urls=("https://bingx.com/en/support/",),  # bingx.py:43-70
        id_rule="site",
        id_field="articleId",  # bingx.py:286,293
        record_url_template="https://bingx.com/en/support/articles/{id}",
        ts_field="updateTime",
        ts_encoding="iso",  # bingx.py:297-298
        detail_kind="page_html",
        detail_url_template="https://bingx.com/en/support/articles/{id}",
        extract_variant="b",  # extract_text_from_html, bingx.py:190-224
        root_tag="div",
        root_class="article-body",  # bingx.py:243-252
        hosts=("bingx.com", "www.bingx.com"),
    ),
    # reference exchange/bitget.py
    "bitget": RealExchangeProfile(
        name="bitget",
        base_url="https://www.bitget.com",  # bitget.py:24
        discovery="next_data",  # buildId scraped from the hub, bitget.py:32-54
        discovery_urls=(
            "https://www.bitget.com/support/_next/data/{build_id}/en/"
            "support/sections/{section_id}/1.json?slug={section_id}&slug=1",
        ),
        needs_build_id=True,
        id_rule="site",
        id_field="simpleResult.contentId",  # bitget.py:140
        record_url_template="https://www.bitget.com/support/articles/{id}",
        ts_field="simpleResult.showTime",
        ts_encoding="ms",  # bitget.py:144
        detail_kind="json_api",
        detail_url_template=(
            "https://www.bitget.com/support/_next/data/{build_id}/en/"
            "support/articles/{id}.json?contentId={id}"
        ),  # bitget.py:104
        # title + "\n" + parse_A(content), bitget.py:109
        content_paths=(
            "pageProps.details.title",
            "html:pageProps.details.content",
        ),
        hosts=("www.bitget.com",),
    ),
    # reference exchange/bithumb.py (module exists; excluded from the
    # reference's main.py golden corpus — no output/bithumb directory)
    "bithumb": RealExchangeProfile(
        name="bithumb",
        base_url="https://www.bithumb.com",  # bithumb.py:23
        discovery="hub_links",
        # category=1 listings, category=6 delistings, bithumb.py:82-83
        discovery_urls=("https://feed.bithumb.com/notice?category={catalog}&page=1",),
        catalogs=("1", "6"),
        title_filters=("안내", "거래지원종료"),  # bithumb.py:90,95
        id_rule="site",
        id_field="id",
        record_url_template="https://feed.bithumb.com/notice/{id}",  # bithumb.py:149
        ts_field=None,  # no list timestamp; recency not applied
        detail_kind="json_api",
        detail_url_template="https://feed.bithumb.com/notice/{id}",
        # title + "\n" + parse_A(content), bithumb.py:154
        content_paths=(
            "props.pageProps.data.title",
            "html:props.pageProps.data.content",
        ),
        hosts=("feed.bithumb.com", "www.bithumb.com"),
    ),
    # reference exchange/bitunix.py
    "bitunix": RealExchangeProfile(
        name="bitunix",
        base_url="https://www.bitunix.com",  # bitunix.py:25
        discovery="hub_links",  # zendesk hub, sections with 'list' headings
        discovery_urls=("https://support.bitunix.com/hc/en-us",),  # bitunix.py:32
        title_filters=("list",),  # bitunix.py:63 (section heading filter)
        id_rule="md5_url",  # bitunix.py:158
        ts_field=None,
        ts_encoding="time_attr",  # article-author <time datetime>, bitunix.py:108-123
        detail_kind="page_html",
        extract_variant="a",
        root_tag="div",
        root_class="article-content",  # bitunix.py:96-106
        hosts=("support.bitunix.com",),
    ),
    # reference exchange/blofin.py
    "blofin": RealExchangeProfile(
        name="blofin",
        base_url="https://www.blofin.com",  # blofin.py:25
        discovery="hub_links",
        discovery_urls=("https://support.blofin.com/hc/en-us",),  # blofin.py:32
        title_filters=("list",),  # blofin.py:66
        id_rule="md5_url",  # blofin.py:158
        ts_field=None,
        ts_encoding="time_attr",  # blofin.py:110-126
        detail_kind="page_html",
        extract_variant="a",
        root_tag="div",
        root_class="article-content",  # blofin.py:98-108
        hosts=("support.blofin.com",),
    ),
    # reference exchange/btcc.py
    "btcc": RealExchangeProfile(
        name="btcc",
        base_url="https://www.btcc.com",  # btcc.py:19
        discovery="list_api",
        discovery_urls=(
            "https://www.btcc.com/news/v2/more/228"
            "?limit=20&lang=en_US&containDetail=true",
        ),  # btcc.py:55
        id_rule="site",
        id_field="id",  # btcc.py:77 (uuid4 fallback when absent)
        record_url_template="https://www.btcc.com/en-US/detail/{id}",  # btcc.py:85
        ts_field="ctime",
        ts_encoding="ms",  # btcc.py:80-81
        detail_kind="list_payload",
        content_paths=("content",),  # btcc.py:94 (raw text in the list item)
        hosts=("www.btcc.com",),
    ),
    # reference exchange/bybit.py
    "bybit": RealExchangeProfile(
        name="bybit",
        base_url="https://www.bybit.com",  # bybit.py:19
        discovery="search_api",
        discovery_urls=(
            "https://announcements.bybit.com/x-api/announcements/api/"
            "search/v1/index/announcement-posts_zh-my",
        ),  # bybit.py:41
        catalogs=("delistings", "new_crypto"),  # category.key filters, bybit.py:28,36
        id_rule="md5_rel_url",  # md5 of the RELATIVE url, bybit.py:121
        url_prefix="https://announcements.bybit.com/zh-MY/",  # bybit.py:116
        ts_field="date",
        ts_encoding="detail",  # release_time comes from the detail, bybit.py:129-130
        detail_kind="next_data",  # articleDetail children walk, bybit.py:81-102
        hosts=("announcements.bybit.com",),
    ),
    # reference exchange/coinex.py
    "coinex": RealExchangeProfile(
        name="coinex",
        base_url="https://www.coinex.com",  # coinex.py:25
        discovery="list_api",  # zendesk articles API per section
        discovery_urls=(
            "https://www.coinex.com/res/support/zendesk/articles/new"
            "?limit=15&page=1&section_id={section_id}&order_by=is_top",
        ),  # coinex.py:74-75
        id_rule="site",
        id_field="id",  # coinex.py:129
        record_url_template=(
            "https://www.coinex.com/en/announcements/detail/{id}"
        ),  # coinex.py:130
        ts_field="created_at",
        ts_encoding="s",  # coinex.py:132-133
        detail_kind="list_payload",
        content_paths=("html:body",),  # parse_A(body), coinex.py:94-107,146
        hosts=("www.coinex.com",),
        # coinex.py:137 writes tombstones with "exchange": "upbit" — a
        # reference copy-paste bug, faithfully present in all 24
        # committed coinex tombstone goldens.
        quirks=("tombstone_exchange=upbit",),
    ),
    # reference exchange/gate.py
    "gate": RealExchangeProfile(
        name="gate",
        base_url="https://www.gate.com",  # gate.py:16
        discovery="next_data",  # buildId + spot/futures lists, gate.py:45-57
        discovery_urls=(
            "https://www.gate.com/announcements/_next/data/{build_id}/zh/"
            "announcements/{catalog}.json?category={catalog}",
        ),
        catalogs=("newspotlistings", "newfutureslistings"),
        needs_build_id=True,
        id_rule="site",
        id_field="id",  # gate.py:78
        record_url_template=(
            "https://www.gate.com/zh/announcements/article/{id}"
        ),  # gate.py:89
        ts_field="release_timestamp",
        ts_encoding="s",  # gate.py:80-81
        detail_kind="json_api",
        detail_url_template=(
            "https://www.gate.com/announcements/_next/data/{build_id}/zh/"
            "announcements/article/{id}.json?slug={id}"
        ),  # gate.py:60
        content_paths=("pageProps.tdkTitle", "pageProps.detail.desc"),  # gate.py:65
        hosts=("www.gate.com",),
    ),
    # reference exchange/lbank.py
    "lbank": RealExchangeProfile(
        name="lbank",
        base_url="https://www.lbank.com",  # lbank.py:19
        discovery="hub_links",  # category links + noticeList POST, lbank.py:22-104
        discovery_urls=(
            "https://www.lbank.com/support/sections/latest-news/notice",
        ),  # lbank.py:24
        title_filters=("Delist", "delist"),  # Notification-category filter, lbank.py:179-184
        id_rule="site",
        id_field="code",  # lbank.py:198
        record_url_template="https://www.lbank.com/support/articles/{id}",  # lbank.py:201
        ts_field="contentShowTime",
        ts_encoding="ms",  # lbank.py:200-201
        detail_kind="json_api",
        detail_url_template=(
            "https://www.lbank.com/_next/data/{build_id}/en-US/support/"
            "articles/{id}.json?slug={id}"
        ),  # lbank.py:156
        needs_build_id=True,
        content_paths=(
            "pageProps.detail.noticeContent.title",
            "pageProps.detail.noticeContent.summary",
        ),  # lbank.py:158-160
        hosts=("www.lbank.com",),
    ),
    # reference exchange/mexc.py
    "mexc": RealExchangeProfile(
        name="mexc",
        base_url="https://www.mexc.com",  # mexc.py:24
        discovery="list_api",  # section API, mexc.py:53-65
        discovery_urls=(
            "https://www.mexc.com/help/announce/api/zh-MY/section/"
            "{section_id}/articles?page=1&perPage=20",
        ),
        id_rule="site",
        id_field="id",  # mexc.py:119
        record_url_template=(
            "https://www.mexc.com/zh-MY/support/articles/{id}"
        ),  # mexc.py:123
        ts_field="createdAt",
        ts_encoding="iso",  # mexc.py:124-125
        detail_kind="json_api",
        detail_url_template=(
            "https://www.mexc.com/help/announce/api/zh-MY/article/{id}"
        ),  # mexc.py:86
        content_paths=("data.title", "html:data.body"),  # mexc.py:88
        hosts=("www.mexc.com",),
    ),
    # reference exchange/okx.py
    "okx": RealExchangeProfile(
        name="okx",
        base_url="https://www.okx.com",  # okx.py:19
        discovery="hub_links",
        discovery_urls=(
            "https://www.okx.com/zh-hans/help/section/announcements-new-listings",
            "https://www.okx.com/zh-hans/help/section/announcements-delistings",
        ),  # okx.py:29-30
        id_rule="site",
        id_field="id",  # okx.py:123 (url built from 'slug', okx.py:126)
        record_url_template=None,  # url = prefix + slug; id not in url
        url_prefix="https://www.okx.com/zh-hans/help/",
        ts_field="publishTime",
        ts_encoding="iso",  # okx.py:129-130
        detail_kind="page_html",
        extract_variant="b",  # extract_text_from_html, okx.py:66-100
        root_tag="article",  # okx.py:102-108
        hosts=("www.okx.com",),
    ),
    # reference exchange/upbit.py
    "upbit": RealExchangeProfile(
        name="upbit",
        base_url="https://upbit.com",  # upbit.py:20
        discovery="list_api",
        discovery_urls=(
            "https://api-manager.upbit.com/api/v1/announcements"
            "?os=web&page=1&per_page=20&category=trade",
        ),  # upbit.py:23-32
        id_rule="site",
        id_field="id",  # upbit.py:51
        record_url_template=(
            "https://upbit.com/service_center/notice?id={id}"
        ),  # upbit.py:52
        ts_field="first_listed_at",
        ts_encoding="iso",  # upbit.py:54-55
        detail_kind="json_api",
        detail_url_template=(
            "https://api-manager.upbit.com/api/v1/announcements/{id}"
        ),  # upbit.py:35
        content_paths=("data.body",),  # upbit.py:34-40 (raw body, no title)
        hosts=("upbit.com", "api-manager.upbit.com"),
    ),
    # reference exchange/weex.py
    "weex": RealExchangeProfile(
        name="weex",
        base_url="https://www.weex.com",  # weex.py:25
        discovery="hub_links",
        discovery_urls=("https://weexsupport.zendesk.com/hc/en-us",),  # weex.py:32
        title_filters=("listing",),  # link-text filter, weex.py:52
        id_rule="md5_url",  # weex.py:145
        ts_field=None,
        ts_encoding="time_attr",  # weex.py:96-111
        detail_kind="page_html",
        extract_variant="a",
        root_tag="div",
        root_class="article-body",  # weex.py:83-93
        hosts=("weexsupport.zendesk.com",),
    ),
}


def article_id(profile: RealExchangeProfile, item: dict | None = None,
               full_url: str | None = None) -> str:
    """Derive the announcement id exactly as the reference does (M10):
    the site id field, md5 of the full url, or md5 of the RELATIVE url
    (bybit, ``exchange/bybit.py:121``)."""
    if profile.id_rule == "md5_url":
        if full_url is None:
            raise ValueError("md5_url id rule needs full_url")
        return _md5(full_url)
    if profile.id_rule == "md5_rel_url":
        if full_url is None:
            raise ValueError("md5_rel_url id rule needs full_url")
        rel = full_url
        if rel.startswith(profile.url_prefix):
            rel = rel[len(profile.url_prefix):]
        return _md5(rel)
    # site id: walk a dotted path (bitget's simpleResult.contentId)
    val = item or {}
    for part in (profile.id_field or "id").split("."):
        val = val.get(part, {}) if isinstance(val, dict) else {}
    return str(val) if not isinstance(val, dict) else ""


def record_url(profile: RealExchangeProfile, aid: str,
               item: dict | None = None) -> str | None:
    """The canonical announcement url written into records (K1).  For
    slug-url sites (okx) the url derives from the item's slug; for
    md5-id sites the discovered full_url IS the record url (returns
    None — caller keeps the frontier url)."""
    if profile.record_url_template is not None:
        return profile.record_url_template.format(id=aid)
    if profile.name == "okx":
        slug = (item or {}).get("slug", "")
        return profile.url_prefix + str(slug)  # okx.py:126
    return None


def tombstone_exchange(profile: RealExchangeProfile) -> str:
    """The ``exchange`` field the reference writes into tombstones —
    coinex stamps ``"upbit"`` (copy-paste bug, ``coinex.py:137``),
    everyone else their own name.  Kept as data so conformance mode can
    reproduce the reference byte-for-byte while default mode corrects it."""
    if "tombstone_exchange=upbit" in profile.quirks:
        return "upbit"
    return profile.name


def normalize_release_time(profile: RealExchangeProfile, value) -> str:
    """Site timestamp encoding -> Asia/Hong_Kong '%Y-%m-%d %H:%M:%S'
    string (M7; reference ``exchange/binance.py:239`` and 12 clones)."""
    enc = profile.ts_encoding
    if enc == "ms":
        return timefmt.epoch_ms_to_hk(int(value))
    if enc == "s":
        return timefmt.epoch_s_to_hk(int(value))
    # iso / time_attr / detail: ISO-8601 strings (naive treated as UTC,
    # matching pd.to_datetime(..., utc=True))
    return timefmt.iso_to_hk(str(value).replace("Z", "+00:00"))


def _walk(payload: dict, dotted: str):
    val = payload
    for part in dotted.split("."):
        if not isinstance(val, dict):
            return None
        val = val.get(part)
    return val


def detail_text(profile: RealExchangeProfile, payload: dict) -> str:
    """Assemble announcement text from a JSON detail payload by the
    profile's ``content_paths`` — the reference's per-site projections
    (M6): path segments are joined with '\\n'; an ``html:`` prefix runs
    the segment through extraction variant A first
    (``parse_announcement_content``, ``base_scraper.py:271-285``), as
    mexc/bitget/bithumb/coinex do on their embedded-HTML bodies."""
    parts = []
    for path in profile.content_paths:
        through_html = path.startswith("html:")
        raw = _walk(payload, path[5:] if through_html else path)
        if raw is None:
            continue
        s = str(raw)
        parts.append(html_text.extract_text_a(s) if through_html else s)
    return "\n".join(parts)


def real_extract_profiles() -> dict[str, ExtractProfile]:
    """Host -> ExtractProfile registry for the 15 real sites, the
    drop-in analog of ``stages.extract.profiles_for_sources`` for the
    reference's actual web.  JSON-transport sites extract via
    ``detail_text`` instead; their hosts get a plain variant-A profile
    for hub/fallback pages."""
    out: dict[str, ExtractProfile] = {}
    for p in REAL_EXCHANGES.values():
        for h in p.hosts:
            if p.detail_kind == "next_data":
                out[h] = ExtractProfile(
                    variant=p.extract_variant, exchange=p.name,
                    json_detail=True,
                )
            elif p.detail_kind == "page_html":
                out[h] = ExtractProfile(
                    variant=p.extract_variant,
                    root_tag=p.root_tag,
                    root_class=p.root_class,
                    exchange=p.name,
                )
            else:  # json_api / list_payload: hub pages only
                out[h] = ExtractProfile(variant="a", exchange=p.name)
    return out


def _dicts_with_key(obj, key: str, depth: int = 0):
    """Recursively collect dicts carrying ``key`` AND a title — the
    announcement list items inside an arbitrarily-nested API payload
    (the reference hardcodes each site's path, e.g.
    ``data.catalogs[0].articles``; walking finds the same items
    without the path data)."""
    out = []
    if depth > 8:
        return out
    if isinstance(obj, dict):
        if key in obj and "title" in obj:
            out.append(obj)
        else:
            for v in obj.values():
                out.extend(_dicts_with_key(v, key, depth + 1))
    elif isinstance(obj, list):
        for v in obj:
            out.extend(_dicts_with_key(v, key, depth + 1))
    return out


def real_links_fn():
    """Profile-aware frontier discovery for ``CrawlConfig.links_fn``:
    on hosts with a registered profile and a JSON-shaped list payload
    (``<pre>``-wrapped, ``__NEXT_DATA__``, or a raw JSON body), map
    each list item to its announcement url by the profile's id/url
    rules — binance ``code`` -> detail template
    (``exchange/binance.py:235,277``), bybit relative ``url`` ->
    ``zh-MY`` prefix (``exchange/bybit.py:116``), okx ``slug`` ->
    help path (``exchange/okx.py:126``), and so on.  HTML hubs and
    unprofiled hosts fall through to the generic
    ``links_from_page`` scan."""
    import json as _json

    from cex_crawler_ray.functions.html_text import (
        get_json_from_pre,
        get_next_data,
        links_from_page,
    )

    by_host = {h: p for p in REAL_EXCHANGES.values() for h in p.hosts}

    def _host_of(url: str) -> str:
        rest = url.split("://", 1)[-1]
        return rest.split("/", 1)[0].split(":", 1)[0].lower()

    def fn(url: str, doc: str):
        p = by_host.get(_host_of(url))
        if p is None:
            return links_from_page(doc)
        payload = None
        if "<pre" in doc:
            payload = get_json_from_pre(doc)
        elif "__NEXT_DATA__" in doc:
            payload = get_next_data(doc)
        else:
            head = doc.lstrip()[:1]
            if head in ("{", "["):
                try:
                    payload = _json.loads(doc)
                except ValueError:
                    payload = None
        if not isinstance(payload, (dict, list)):
            return links_from_page(doc)
        out = []
        if p.id_rule == "md5_rel_url":
            # bybit: items carry a RELATIVE url (bybit.py:115-121)
            for item in _dicts_with_key(payload, "url"):
                rel = item.get("url")
                if isinstance(rel, str) and rel and not rel.startswith(
                    "http"
                ):
                    out.append(
                        (p.url_prefix + rel, str(item.get("title", "")))
                    )
        else:
            key = (p.id_field or "id").split(".")[0]
            if p.name == "okx":
                key = "slug"  # url derives from slug, okx.py:126
            for item in _dicts_with_key(payload, key):
                aid = article_id(p, item=item)
                ru = record_url(p, aid, item)
                if aid and ru:
                    out.append((ru, str(item.get("title", ""))))
        return out if out else links_from_page(doc)

    return fn
