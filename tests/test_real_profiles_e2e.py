"""End-to-end crawl over a REAL-exchange-shaped synthetic web: the
profile data pack drives discovery (binance list-API JSON, bybit
__NEXT_DATA__ search hits, weex zendesk HTML hub), fetch, and
extraction (whole-page variant A, articleDetail JSON walk,
article-body root) through the actual crawl machinery."""

import datetime as dt
import hashlib
import json

import pyarrow as pa
import pytest

import ray
from cex_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from cex_crawler_ray.profiles import REAL_EXCHANGES, real_extract_profiles
from cex_crawler_ray.profiles.real_exchanges import real_links_fn
from cex_crawler_ray.schemas import PAGES
from cex_crawler_ray.sources.page_store import PageStore
from cex_crawler_ray.state.politeness import RobotsPolicy

TS = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)

BINANCE_HUB = (
    "https://www.binance.com/bapi/apex/v1/public/apex/cms/article/"
    "list/query?type=1&pageNo=1&pageSize=20&catalogId=161"
)
BYBIT_HUB = (
    "https://announcements.bybit.com/x-api/announcements/api/search/"
    "v1/index/announcement-posts_zh-my"
)
WEEX_HUB = "https://weexsupport.zendesk.com/hc/en-us"


def _binance_list_page():
    payload = {
        "data": {
            "catalogs": [
                {
                    "articles": [
                        {"code": "aa11", "title": "Binance Will List FOO"},
                        {"code": "bb22", "title": "Notice: BAR delisting"},
                    ]
                }
            ]
        }
    }
    return (
        "<html><body><pre>"
        + json.dumps(payload)
        + "</pre></body></html>"
    )


def _bybit_search_page():
    blob = {
        "props": {
            "pageProps": {
                "result": {
                    "hits": [
                        {"url": "new-coin-foo/", "title": "New listing FOO"},
                    ]
                }
            }
        }
    }
    return (
        "<html><body><script id='__NEXT_DATA__' type='application/json'>"
        + json.dumps(blob)
        + "</script></body></html>"
    )


def _bybit_detail_page():
    blob = {
        "props": {
            "pageProps": {
                "articleDetail": {
                    "title": "Bybit 新币上线 FOO",
                    "content": {
                        "json": {
                            "children": [
                                {"type": "p", "children": [{"text": "开放交易。"}]},
                            ]
                        }
                    },
                }
            }
        }
    }
    return (
        "<html><body><script id='__NEXT_DATA__' type='application/json'>"
        + json.dumps(blob)
        + "</script></body></html>"
    )


def _pages_table():
    binance = REAL_EXCHANGES["binance"]
    bybit = REAL_EXCHANGES["bybit"]
    rows = [
        (BINANCE_HUB, _binance_list_page()),
        (
            binance.record_url_template.format(id="aa11"),
            "<html><body><h1>Binance Will List FOO</h1>"
            "<p>FOO/USDT opens soon.</p></body></html>",
        ),
        (
            binance.record_url_template.format(id="bb22"),
            "<html><body><h1>Notice: BAR delisting</h1>"
            "<p>BAR/USDT closes.</p></body></html>",
        ),
        (BYBIT_HUB, _bybit_search_page()),
        # stored at the CANONICAL url (trailing slash stripped by the
        # frontier canonicalizer before the store join)
        (bybit.url_prefix + "new-coin-foo", _bybit_detail_page()),
        (
            WEEX_HUB,
            "<html><body><div class='sidebar'>junk</div>"
            "<a href='/hc/en-us/articles/1-weex-listing-foo'>"
            "WEEX listing FOO</a></body></html>",
        ),
        (
            "https://weexsupport.zendesk.com/hc/en-us/articles/"
            "1-weex-listing-foo",
            "<html><body><div class='article-body'>"
            "<p>WEEX will list FOO.</p></div>"
            "<div class='article-author'>"
            "<time datetime='2024-02-28T01:00:00Z'>Feb 28</time>"
            "</div></body></html>",
        ),
    ]
    return pa.Table.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.string()),
            pa.array([TS] * len(rows), pa.timestamp("us", tz="UTC")),
            pa.array(
                [r[1].encode("utf-8") for r in rows], pa.binary()
            ),
            pa.array([""] * len(rows), pa.string()),
            pa.array(["en"] * len(rows), pa.string()),
        ],
        schema=PAGES,
    )


@pytest.fixture(scope="module")
def real_run(ray_session, tmp_path_factory):
    ps = PageStore(
        str(tmp_path_factory.mktemp("real_ps") / "store"), num_buckets=4
    )
    ps.write(ray.data.from_arrow(_pages_table()))
    seeds = ray.data.from_items(
        [
            {"url": BINANCE_HUB, "priority": 0},
            {"url": BYBIT_HUB, "priority": 0},
            {"url": WEEX_HUB, "priority": 0},
        ]
    )
    policy = RobotsPolicy(disallow={}, default_delay_ms=500)
    cfg = CrawlConfig(
        max_rounds=4,
        profiles=real_extract_profiles(),
        links_fn=real_links_fn(),
        as_of_hk="2024-03-08 09:00:00",
        offset_days=30,
    )
    return run_crawl(ps, seeds, policy, cfg)


def test_profile_discovery_reaches_all_details(real_run):
    fetched = set(real_run.fetched_table()["url"].to_pylist())
    binance = REAL_EXCHANGES["binance"]
    bybit = REAL_EXCHANGES["bybit"]
    assert binance.record_url_template.format(id="aa11") in fetched
    assert binance.record_url_template.format(id="bb22") in fetched
    assert bybit.url_prefix + "new-coin-foo" in fetched or (
        bybit.url_prefix + "new-coin-foo/" in fetched
    )
    assert (
        "https://weexsupport.zendesk.com/hc/en-us/articles/"
        "1-weex-listing-foo" in fetched
    )


def test_profile_extraction_through_crawl(real_run):
    ft = real_run.extracted_table().to_pandas()
    by_url = dict(zip(ft["url"], ft["text"]))
    binance = REAL_EXCHANGES["binance"]
    # binance: whole-page variant A
    t = by_url[binance.record_url_template.format(id="aa11")]
    assert "Binance Will List FOO" in t and "FOO/USDT opens soon." in t
    # bybit: __NEXT_DATA__ articleDetail projection
    bybit_urls = [u for u in by_url if "new-coin-foo" in u]
    assert bybit_urls
    assert by_url[bybit_urls[0]] == "Bybit 新币上线 FOO\n开放交易。"
    # weex: article-body root, author/time excluded
    t = by_url[
        "https://weexsupport.zendesk.com/hc/en-us/articles/"
        "1-weex-listing-foo"
    ]
    assert t == "WEEX will list FOO."
    # exchange attribution comes from the host profile registry
    by_ex = dict(zip(ft["url"], ft["exchange"]))
    assert by_ex[binance.record_url_template.format(id="aa11")] == "binance"
    assert by_ex[bybit_urls[0]] == "bybit"
