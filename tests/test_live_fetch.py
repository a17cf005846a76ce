"""Live fetch actor pool (sources/live_fetch.py) + M16 header synthesis:
bounded content-sniff retries, dead-letter rows (no silent drops), and
drop-in compatibility with the crawl loop via CrawlConfig.fetch_fn.
"""

import datetime

import numpy as np
import pyarrow as pa
import pytest

import ray

from cex_crawler_ray.functions.headers import (
    csrf_token,
    device_info_b64,
    device_uuid,
    synth_headers,
)
from cex_crawler_ray.sources.live_fetch import (
    LiveFetcher,
    live_fetch,
    store_transport_factory,
)


# ------------------------------------------------------------- headers
def test_headers_deterministic_and_distinct():
    h1 = synth_headers("https://a.test/x", seed=0)
    h2 = synth_headers("https://a.test/x", seed=0)
    h3 = synth_headers("https://b.test/y", seed=0)
    assert h1 == h2
    assert h1["csrftoken"] != h3["csrftoken"]
    assert h1["device-info"] != h3["device-info"]
    # uuid shape: 8-4-4-4-12 with version nibble 4
    u = device_uuid("https://a.test/x")
    parts = u.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
    assert parts[2][0] == "4"
    assert len(csrf_token("u")) == 32
    import base64, json

    info = json.loads(base64.b64decode(device_info_b64("u")))
    assert "screen_resolution" in info and "canvas_code" in info


# ------------------------------------------------------- retry semantics
class FlakyTransport:
    """Challenge page for the first ``flaky_for`` attempts of urls
    containing 'flaky'; permanent challenge for urls containing 'dead';
    404 for urls containing 'missing'; else 200."""

    def __init__(self, flaky_for=2):
        self.flaky_for = flaky_for
        self.calls: dict = {}

    def __call__(self, url, headers):
        assert "user-agent" in headers  # M16 hook ran
        n = self.calls.get(url, 0) + 1
        self.calls[url] = n
        ts = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)
        if "missing" in url:
            return 404, None, ts
        if "dead" in url or ("flaky" in url and n <= self.flaky_for):
            return 503, b"<html>Checking your browser</html>", ts
        return 200, f"<html>ok {url}</html>".encode(), ts


def test_bounded_retry_and_dead_letter():
    transport = FlakyTransport(flaky_for=2)
    fetcher = LiveFetcher(lambda: transport, max_attempts=3)
    batch = pa.table(
        {
            "url": pa.array(
                [
                    "https://h.test/ok",
                    "https://h.test/flaky",
                    "https://h.test/dead",
                    "https://h.test/missing",
                ]
            )
        }
    )
    out = fetcher(batch)
    rows = {
        r["url"]: r for r in out.to_pylist()
    }
    assert len(rows) == 4  # nothing dropped
    ok = rows["https://h.test/ok"]
    assert (ok["status"], ok["attempts"], ok["fetch_state"]) == (200, 1, "ok")
    fl = rows["https://h.test/flaky"]
    assert (fl["status"], fl["attempts"], fl["fetch_state"]) == (
        200,
        3,
        "ok",
    )
    assert fl["backoff_ms_total"] == 250 + 500
    dead = rows["https://h.test/dead"]
    assert (dead["status"], dead["attempts"], dead["fetch_state"]) == (
        503,
        3,
        "dead_letter",
    )
    assert dead["html"] is None
    miss = rows["https://h.test/missing"]
    assert (miss["status"], miss["attempts"], miss["fetch_state"]) == (
        404,
        1,
        "miss",
    )
    # ≤ max_attempts transport calls per url, ever
    assert max(transport.calls.values()) <= 3


def test_challenge_marker_on_200_still_retries():
    class Challenge200:
        def __init__(self):
            self.n = 0

        def __call__(self, url, headers):
            self.n += 1
            ts = datetime.datetime(
                2024, 3, 1, tzinfo=datetime.timezone.utc
            )
            if self.n == 1:
                return 200, b"<html>cf-challenge</html>", ts
            return 200, b"<html>real content</html>", ts

    t = Challenge200()
    fetcher = LiveFetcher(lambda: t, max_attempts=3)
    out = fetcher(pa.table({"url": pa.array(["https://h.test/p"])}))
    r = out.to_pylist()[0]
    assert r["attempts"] == 2 and r["fetch_state"] == "ok"
    assert b"real content" in r["html"]


# -------------------------------------------------- crawl-loop drop-in
@pytest.fixture(scope="module")
def store(ray_session, sf_tiny, tmp_path_factory):
    from cex_crawler_ray.sources.page_store import PageStore
    from cex_crawler_ray.sources.pages import pages_from_documents

    path = str(tmp_path_factory.mktemp("pagestore_live"))
    ps = PageStore(path, num_buckets=8)
    ps.write(pages_from_documents(sf_tiny))
    return ps


def test_crawl_through_live_fetcher(store, sf_tiny):
    """The flagship crawl runs unchanged through the live actor pool
    (PageStore transport), producing the identical crawl."""
    from cex_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from cex_crawler_ray.sources.pages import (
        robots_rules,
        seeds_for_sources,
        sources_in,
    )
    from cex_crawler_ray.stages.extract import profiles_for_sources
    from cex_crawler_ray.state.politeness import RobotsPolicy

    sources = sources_in(sf_tiny)
    robots = RobotsPolicy(
        disallow=robots_rules(sources), default_delay_ms=500
    )
    kwargs = dict(
        max_rounds=6,
        seen_shards=4,
        profiles=profiles_for_sources(sources),
        as_of_hk="2024-03-08 09:00:00",
        offset_days=7,
    )
    base = run_crawl(
        store, seeds_for_sources(sources), robots, CrawlConfig(**kwargs)
    )

    factory = store_transport_factory(store.path, store.num_buckets)
    cfg_live = CrawlConfig(
        fetch_fn=lambda tbl: live_fetch(
            tbl, factory, concurrency=2, batch_size=128
        ),
        **kwargs,
    )
    live = run_crawl(
        store, seeds_for_sources(sources), robots, cfg_live
    )
    assert live.crawl_order() == base.crawl_order()
    assert sorted(live.fetched_table()["url"].to_pylist()) == sorted(
        base.fetched_table()["url"].to_pylist()
    )
    assert live.seen_set_size() == base.seen_set_size()


# ------------------------------------- production HTTP transport factory
@pytest.fixture(scope="module")
def http_server():
    """Local stdlib HTTP server: 200, 404, and a challenge page that
    clears after two attempts (per-path attempt counters)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    counts: dict = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            n = counts[self.path] = counts.get(self.path, 0) + 1
            if self.path == "/ok":
                body, code = b"<html>hello</html>", 200
            elif self.path == "/challenge":
                if n <= 2:
                    body, code = b"<html>cf-challenge</html>", 200
                else:
                    body, code = b"<html>cleared</html>", 200
            elif self.path == "/always-challenge":
                body, code = b"Checking your browser", 503
            else:
                body, code = b"not here", 404
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", counts
    srv.shutdown()


def test_http_transport_against_local_server(http_server):
    """The requests.Session-per-actor factory through a REAL server:
    200 ok, 404 fail-fast, challenge-sniff retry until cleared,
    permanent challenge dead-letters."""
    from cex_crawler_ray.sources.live_fetch import http_transport_factory

    base, counts = http_server
    fetcher = LiveFetcher(
        transport_factory=http_transport_factory(), max_attempts=3
    )
    s, h, w, attempts, backoff, state = fetcher._fetch_one(f"{base}/ok")
    assert (s, state, attempts) == (200, "ok", 1)
    assert b"hello" in h and w is not None

    s, h, w, attempts, backoff, state = fetcher._fetch_one(f"{base}/nope")
    assert (s, state, attempts, h) == (404, "miss", 1, None)

    # challenge body on 200 retries until the interstitial clears
    s, h, w, attempts, backoff, state = fetcher._fetch_one(
        f"{base}/challenge"
    )
    assert (s, state, attempts) == (200, "ok", 3)
    assert b"cleared" in h
    assert counts["/challenge"] == 3

    s, h, w, attempts, backoff, state = fetcher._fetch_one(
        f"{base}/always-challenge"
    )
    assert (s, state, h) == (503, "dead_letter", None)
    assert attempts == 3 and backoff == 250 + 500

    # connection refused -> status 0, retried, dead-lettered
    dead = LiveFetcher(
        transport_factory=http_transport_factory(timeout_s=2),
        max_attempts=2,
    )
    s, h, w, attempts, backoff, state = dead._fetch_one(
        "http://127.0.0.1:9/never"
    )
    assert (s, state, attempts) == (0, "dead_letter", 2)


def test_http_transport_robots_crawl_delay(http_server):
    """Consecutive same-host requests are spaced by the host's
    crawl_delay_ms; other hosts are not delayed."""
    from cex_crawler_ray.sources.live_fetch import http_transport_factory
    from cex_crawler_ray.state.politeness import RobotsPolicy

    base, _ = http_server
    pol = RobotsPolicy(
        crawl_delay_ms={"127.0.0.1": 2000}, default_delay_ms=1000
    )
    sleeps: list = []
    t = [0.0]

    def clock():
        return t[0]

    def sleep(s):
        sleeps.append(round(s, 6))
        t[0] += s

    transport = http_transport_factory(
        robots_policy=pol, sleep_fn=sleep, clock=clock
    )()
    transport(f"{base}/ok", {})
    assert sleeps == []  # first request: no pacing
    transport(f"{base}/ok", {})
    assert sleeps == [2.0]  # same host: full crawl-delay wait
    t[0] += 5.0
    transport(f"{base}/ok", {})
    assert sleeps == [2.0]  # enough time elapsed: no extra sleep


def test_retry_after_overrides_exponential_backoff(ray_session):
    """A 429 with Retry-After must pace by the server's value when it
    exceeds the exponential schedule (RFC 9110), and the dead-letter /
    eventual-success accounting is unchanged."""
    from cex_crawler_ray.sources.live_fetch import LiveFetcher

    calls = {"n": 0}
    slept = []

    def factory():
        def transport(url, headers):
            calls["n"] += 1
            if calls["n"] < 3:
                return 429, b"slow down", None, 7.5  # Retry-After 7.5s
            import datetime as dt

            return (
                200,
                b"ok body",
                dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc),
            )

        return transport

    f = LiveFetcher(
        factory,
        max_attempts=3,
        base_backoff_ms=100,
        sleep_fn=lambda s: slept.append(s),
    )
    import pyarrow as pa

    out = f(pa.table({"url": pa.array(["https://x.test/a"], pa.string())}))
    assert out["fetch_state"][0].as_py() == "ok"
    assert out["attempts"][0].as_py() == 3
    # both waits paced by Retry-After (7500ms > 100ms and > 200ms)
    assert slept == [7.5, 7.5]
    assert out["backoff_ms_total"][0].as_py() == 15000


def test_conditional_get_304_not_modified(ray_session):
    """An if_modified_since column triggers a conditional GET; a 304
    response short-circuits (no retries, no body) as 'not_modified',
    while rows without the column fetch normally."""
    import datetime as dt

    import pyarrow as pa

    from cex_crawler_ray.sources.live_fetch import LiveFetcher

    seen_headers = []

    def factory():
        def transport(url, headers):
            seen_headers.append(dict(headers))
            ts = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
            if "If-Modified-Since" in headers:
                return 304, None, ts
            return 200, b"body", ts

        return transport

    f = LiveFetcher(factory, max_attempts=3)
    last = dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc)
    batch = pa.table(
        {
            "url": pa.array(
                ["https://x.test/a", "https://x.test/b"], pa.string()
            ),
            "if_modified_since": pa.array(
                [last, None], pa.timestamp("us", tz="UTC")
            ),
        }
    )
    out = f(batch)
    assert out["fetch_state"].to_pylist() == ["not_modified", "ok"]
    assert out["status"].to_pylist() == [304, 200]
    assert out["attempts"].to_pylist() == [1, 1]
    assert out["html"].to_pylist() == [None, b"body"]
    assert (
        seen_headers[0]["If-Modified-Since"]
        == "Thu, 01 Feb 2024 00:00:00 GMT"
    )
    assert "If-Modified-Since" not in seen_headers[1]


def test_host_circuit_breaker_opens_and_half_opens(ray_session):
    """After breaker_threshold consecutive dead-letters for a host its
    rows fail fast as circuit_open; after cooldown the next row is a
    half-open probe (and a success closes the breaker). Other hosts
    are unaffected."""
    import pyarrow as pa

    from cex_crawler_ray.sources.live_fetch import LiveFetcher

    sick = {"on": True}
    tcalls = []

    def factory():
        def transport(url, headers):
            tcalls.append(url)
            import datetime as dt

            ts = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
            if "sick.test" in url and sick["on"]:
                return 500, b"err", ts
            return 200, b"ok", ts

        return transport

    t = {"now": 0.0}
    f = LiveFetcher(
        factory,
        max_attempts=2,
        breaker_threshold=2,
        breaker_cooldown_s=30.0,
        clock=lambda: t["now"],
    )

    def run(urls):
        return f(
            pa.table({"url": pa.array(urls, pa.string())})
        )["fetch_state"].to_pylist()

    assert run(
        ["https://sick.test/1", "https://sick.test/2", "https://ok.test/1"]
    ) == ["dead_letter", "dead_letter", "ok"]
    # breaker now open: no transport calls for sick host
    n_before = len(tcalls)
    assert run(["https://sick.test/3", "https://ok.test/2"]) == [
        "circuit_open",
        "ok",
    ]
    assert sum("sick.test" in u for u in tcalls[n_before:]) == 0
    # cooldown passes; host recovered -> half-open probe succeeds
    t["now"] = 31.0
    sick["on"] = False
    assert run(["https://sick.test/4", "https://sick.test/5"]) == [
        "ok",
        "ok",
    ]
