"""Real-exchange profile data pack conformance — replays the
reference's committed golden output corpus (~490 JSONs under
/root/reference/output/) through the declarative profiles in
cex_crawler_ray/profiles/real_exchanges.py.

What the goldens pin, per exchange:

* record/tombstone schema (the two exact key sets the reference writes)
* id derivation (site-id vs md5(full_url) vs md5(relative-url))
* record-url reconstruction from the filename id (url templates)
* Asia/Hong_Kong '%Y-%m-%d %H:%M:%S' release_time format
* the analyzer flatten order (listings before delistings) and the
  validate/flatten round-trip over real LLM-produced entries
* the reference's coinex tombstone quirk (exchange='upbit')

The goldens were produced by the reference's LLM path, so the
deterministic fallback analyzer is NOT expected to reproduce their
symbol sets — that seam is covered by shape assertions only.
"""

import hashlib
import json
import os
import re
from glob import glob

import pytest

from cex_crawler_ray.functions.analyzer import (
    fallback_analysis,
    flatten_result,
    validate_and_clean,
)
from cex_crawler_ray.profiles import (
    REAL_EXCHANGES,
    article_id,
    detail_text,
    normalize_release_time,
    real_extract_profiles,
    record_url,
    tombstone_exchange,
)

REF_OUT = "/root/reference/output"
needs_goldens = pytest.mark.skipif(
    not os.path.isdir(REF_OUT), reason="reference golden corpus absent"
)

RECORD_KEYS = {
    "symbol", "action", "type", "time",
    "exchange", "title", "url", "release_time", "content",
}
TOMBSTONE_KEYS = {"release_time", "text", "url", "title", "exchange"}
HK_FMT = re.compile(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}")


def _golden_files():
    return sorted(glob(f"{REF_OUT}/*/*.json"))


def _load(path):
    data = json.load(open(path, encoding="utf-8"))
    return data if isinstance(data, list) else [data]


@needs_goldens
def test_corpus_present_and_all_exchanges_covered():
    files = _golden_files()
    assert len(files) > 450
    dirs = {f.split("/")[-2] for f in files}
    # every golden directory has a profile (bithumb has a profile but
    # no goldens — the reference's main.py does not run it)
    assert dirs <= set(REAL_EXCHANGES)
    assert len(dirs) == 14


@needs_goldens
def test_every_golden_matches_its_profile_schema_and_rules():
    n_records = n_tombs = 0
    for path in _golden_files():
        ex = path.split("/")[-2]
        fid = path.split("/")[-1].rsplit(".", 1)[0].split("_", 1)[1]
        prof = REAL_EXCHANGES[ex]
        recs = _load(path)
        if not recs:  # analysis produced no entries; file still written
            continue
        r0 = recs[0]
        url = r0["url"]
        # --- release_time format (M7) --------------------------------
        assert HK_FMT.fullmatch(r0["release_time"]), path
        # --- id + url rules (M10/M11) --------------------------------
        if prof.id_rule in ("md5_url", "md5_rel_url"):
            assert article_id(prof, full_url=url) == fid, path
        elif prof.record_url_template is not None:
            assert record_url(prof, fid) == url, path
        else:  # okx: slug url, prefix pinned
            assert url.startswith(prof.url_prefix), path
        if prof.id_rule == "md5_rel_url":
            assert url.startswith(prof.url_prefix), path
        # --- record vs tombstone shape (K1/K3) -----------------------
        if "text" in r0:
            n_tombs += 1
            assert set(r0) == TOMBSTONE_KEYS, path
            assert r0["text"] == "", path
            assert r0["exchange"] == tombstone_exchange(prof), path
        else:
            n_records += 1
            for r in recs:
                assert set(r) == RECORD_KEYS, path
                assert r["exchange"] == ex, path
                assert r["action"] in ("上架", "下架"), path
                assert r["type"] in ("现货", "合约"), path
            # metadata columns are constant across the file's records
            for k in ("title", "url", "release_time", "content"):
                assert len({r[k] for r in recs}) == 1, path
    assert n_records > 250 and n_tombs > 150


@needs_goldens
def test_flatten_round_trip_on_golden_records():
    """Rebuilding each full-record golden from its analysis entries +
    metadata through validate_and_clean + flatten_result reproduces the
    file exactly — including the reference's listings-before-delistings
    order (deepseek_analyzer.py:233-235)."""
    n = 0
    for path in _golden_files():
        recs = _load(path)
        if not recs or "text" in recs[0]:
            continue
        entries = [
            {k: r[k] for k in ("symbol", "action", "type", "time")}
            for r in recs
        ]
        result = {
            "listings": [e for e in entries if e["action"] == "上架"],
            "delistings": [e for e in entries if e["action"] == "下架"],
        }
        updates = {
            k: recs[0][k]
            for k in ("exchange", "title", "url", "release_time", "content")
        }
        rebuilt = flatten_result(validate_and_clean(result), updates)
        assert rebuilt == recs, path
        n += 1
    assert n > 250


@needs_goldens
def test_fallback_analyzer_runs_clean_over_golden_contents():
    """The deterministic fallback is well-formed over every real
    announcement text (goldens are LLM outputs, so only shape is
    asserted — see module docstring)."""
    for path in _golden_files():
        recs = _load(path)
        if not recs or "text" in recs[0]:
            continue
        out = validate_and_clean(fallback_analysis(recs[0]["content"]))
        for e in out["listings"] + out["delistings"]:
            assert set(e) == {"symbol", "action", "type", "time"}
            assert e["action"] in ("上架", "下架")
            assert e["type"] in ("现货", "合约")


@needs_goldens
def test_discovery_reproduces_golden_urls_from_list_items():
    """Feed real_links_fn synthetic list payloads whose items carry the
    GOLDEN corpus's ids/slugs — the profile-driven item→url mapping
    must reproduce every golden announcement url exactly (site-id
    exchanges + okx slugs + bybit relative urls)."""
    from cex_crawler_ray.profiles.real_exchanges import real_links_fn

    fn = real_links_fn()
    by_ex: dict = {}
    for path in _golden_files():
        recs = _load(path)
        if not recs:
            continue
        ex = path.split("/")[-2]
        fid = path.split("/")[-1].rsplit(".", 1)[0].split("_", 1)[1]
        by_ex.setdefault(ex, []).append((fid, recs[0]["url"]))

    def nest(dotted, value, title):
        parts = dotted.split(".")
        item = {parts[-1]: value, "title": title}
        # the id field's LAST component lives beside title (bitget's
        # simpleResult nests the id one level down)
        if len(parts) > 1:
            inner = {parts[-1]: value}
            item = {parts[0]: inner, "title": title}
        return item

    n_checked = 0
    for ex, entries in by_ex.items():
        prof = REAL_EXCHANGES[ex]
        host_url = prof.base_url + "/x"
        if prof.id_rule == "site" and prof.record_url_template:
            items = [nest(prof.id_field or "id", fid, "t") for fid, _ in entries]
            doc = json.dumps({"data": {"list": items}})
            got = dict(fn(host_url, doc))
            want = {url: "t" for _, url in entries}
            assert got == want, ex
            n_checked += len(entries)
        elif ex == "okx":
            # url derives from the slug; goldens pin the prefix
            slugs = [url.split("/help/", 1)[1] for _, url in entries]
            items = [{"id": f, "slug": s, "title": "t"}
                     for (f, _), s in zip(entries, slugs)]
            doc = json.dumps({"data": items})
            got = {u for u, _ in fn("https://www.okx.com/x", doc)}
            assert got == {url for _, url in entries}
            n_checked += len(entries)
        elif ex == "bybit":
            rels = [url[len(prof.url_prefix):] for _, url in entries]
            items = [{"url": r, "title": "t"} for r in rels]
            doc = json.dumps({"result": {"hits": items}})
            got = {u for u, _ in fn("https://announcements.bybit.com/x", doc)}
            assert got == {url for _, url in entries}
            n_checked += len(entries)
    assert n_checked > 300


def test_timestamp_encodings():
    b = REAL_EXCHANGES["binance"]   # epoch ms, binance.py:238-239
    g = REAL_EXCHANGES["gate"]      # epoch s, gate.py:80-81
    m = REAL_EXCHANGES["mexc"]      # ISO, mexc.py:124-125
    assert normalize_release_time(b, 1756137606000) == "2025-08-26 00:00:06"
    assert normalize_release_time(g, 1756018979) == "2025-08-24 15:02:59"
    assert (
        normalize_release_time(m, "2025-08-24T07:02:59Z")
        == "2025-08-24 15:02:59"
    )
    assert (
        normalize_release_time(m, "2025-08-24T15:02:59+08:00")
        == "2025-08-24 15:02:59"
    )


def test_detail_text_projections():
    # gate: tdkTitle + "\n" + detail.desc (gate.py:65)
    gate = REAL_EXCHANGES["gate"]
    assert (
        detail_text(gate, {"pageProps": {"tdkTitle": "T", "detail": {"desc": "D"}}})
        == "T\nD"
    )
    # mexc: data.title + "\n" + parse_A(data.body) (mexc.py:88)
    mexc = REAL_EXCHANGES["mexc"]
    out = detail_text(
        mexc,
        {"data": {"title": "标题", "body": "<p>hello <b>world</b></p>"}},
    )
    assert out == "标题\nhello world"
    # bitget: pageProps.details.* (bitget.py:109)
    bitget = REAL_EXCHANGES["bitget"]
    assert (
        detail_text(
            bitget,
            {"pageProps": {"details": {"title": "T", "content": "<div>B</div>"}}},
        )
        == "T\nB"
    )
    # bithumb: props.pageProps.data.* (bithumb.py:154)
    bithumb = REAL_EXCHANGES["bithumb"]
    assert (
        detail_text(
            bithumb,
            {"props": {"pageProps": {"data": {"title": "T", "content": "<p>B</p>"}}}},
        )
        == "T\nB"
    )
    # lbank: noticeContent title + summary, no html pass (lbank.py:158-160)
    lbank = REAL_EXCHANGES["lbank"]
    assert (
        detail_text(
            lbank,
            {"pageProps": {"detail": {"noticeContent": {"title": "T", "summary": "S"}}}},
        )
        == "T\nS"
    )
    # upbit: raw data.body, no title (upbit.py:34-40)
    upbit = REAL_EXCHANGES["upbit"]
    assert detail_text(upbit, {"data": {"body": "B"}}) == "B"
    # coinex: parse_A of the list item's body (coinex.py:146)
    coinex = REAL_EXCHANGES["coinex"]
    # get_text() concatenates adjacent <p> texts with no separator —
    # exact variant-A (base_scraper.py:271-285) semantics
    assert detail_text(coinex, {"body": "<p>B1</p><p>B2</p>"}) == "B1B2"
    # btcc: raw content field (btcc.py:94)
    btcc = REAL_EXCHANGES["btcc"]
    assert detail_text(btcc, {"content": "C"}) == "C"


def test_id_rules_synthetic():
    weex = REAL_EXCHANGES["weex"]
    u = "https://weexsupport.zendesk.com/hc/en-us/articles/123-listing-abc"
    assert article_id(weex, full_url=u) == hashlib.md5(u.encode()).hexdigest()
    bybit = REAL_EXCHANGES["bybit"]
    rel = "article-xyz/"
    full = bybit.url_prefix + rel
    assert (
        article_id(bybit, full_url=full)
        == hashlib.md5(rel.encode()).hexdigest()
    )
    bitget = REAL_EXCHANGES["bitget"]
    item = {"simpleResult": {"contentId": "987", "showTime": "1"}}
    assert article_id(bitget, item=item) == "987"
    assert record_url(bitget, "987") == (
        "https://www.bitget.com/support/articles/987"
    )
    okx = REAL_EXCHANGES["okx"]
    assert record_url(okx, "ignored", {"slug": "some-slug"}) == (
        "https://www.okx.com/zh-hans/help/some-slug"
    )


def test_extraction_through_real_registry():
    """Real-shaped pages through extract_with_profile + the real-host
    registry: okx <article> variant B, weex article-body variant A,
    bitunix article-content variant A, bybit __NEXT_DATA__ detail."""
    import json as _json

    from cex_crawler_ray.stages.extract import extract_with_profile

    reg = real_extract_profiles()
    okx_html = (
        "<html><head><script>x=1</script></head><body><nav>menu</nav>"
        "<article><h1>欧易公告</h1><p>OKX 将下线   某些币对。</p></article>"
        "<footer>foot</footer></body></html>"
    )
    out = extract_with_profile(okx_html, reg["www.okx.com"])
    assert "欧易公告" in out and "menu" not in out and "foot" not in out
    # variant B collapses whitespace runs to single spaces
    assert "   " not in out

    weex_html = (
        "<html><body><div class='sidebar'>junk</div>"
        "<div class='article-body'><p>WEEX will list ABC.</p>"
        "<p>Trading opens soon.</p></div></body></html>"
    )
    out = extract_with_profile(weex_html, reg["weexsupport.zendesk.com"])
    assert "WEEX will list ABC." in out and "junk" not in out

    btx_html = (
        "<html><body><div class='article-content'><p>Bitunix notice.</p>"
        "</div><div class='article-author'><time datetime='2025-08-20T01:00:00Z'>"
        "Aug 20</time></div></body></html>"
    )
    out = extract_with_profile(btx_html, reg["support.bitunix.com"])
    assert "Bitunix notice." in out and "Aug 20" not in out

    blob = {
        "props": {
            "pageProps": {
                "articleDetail": {
                    "title": "Bybit 新币上线",
                    "content": {
                        "json": {
                            "children": [
                                {"type": "p", "children": [{"text": "段落一"}]},
                                {"type": "img", "children": [{"text": "skip"}]},
                                {"type": "p", "children": [{"text": "段落二"}]},
                            ]
                        }
                    },
                }
            }
        }
    }
    bybit_html = (
        "<html><body><script id='__NEXT_DATA__' type='application/json'>"
        + _json.dumps(blob)
        + "</script></body></html>"
    )
    out = extract_with_profile(bybit_html, reg["announcements.bybit.com"])
    assert out == "Bybit 新币上线\n段落一 段落二"


def test_real_extract_profiles_registry():
    reg = real_extract_profiles()
    # every profile host is covered
    for p in REAL_EXCHANGES.values():
        for h in p.hosts:
            assert h in reg
    assert reg["www.okx.com"].variant == "b"
    assert reg["www.okx.com"].root_tag == "article"
    assert reg["announcements.bybit.com"].json_detail
    assert reg["support.bitunix.com"].root_class == "article-content"
    assert reg["bingx.com"].variant == "b"
    assert reg["bingx.com"].root_class == "article-body"
    assert reg["www.binance.com"].variant == "a"
    assert reg["www.binance.com"].root_tag is None
