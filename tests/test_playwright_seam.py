"""Browser-transport seam (playwright_transport_factory) driven by a
stub browser object with the sync-Playwright surface.

The container has no browser engine, so the seam is proven against a
fake exposing exactly the API the real factory drives: launch once per
actor, new_page/goto/content/close per fetch, browser.close at
teardown, dead-letter on crash — the reference's browser lifecycle
(reference exchange/base_scraper.py:78-143) expressed as a LiveFetcher
transport.
"""

import datetime as dt

import pyarrow as pa
import pytest

from cex_crawler_ray.sources.live_fetch import (
    LiveFetcher,
    playwright_transport_factory,
)


class FakeResponse:
    def __init__(self, status):
        self.status = status


class FakePage:
    def __init__(self, browser):
        self._browser = browser
        self.headers = None
        self.closed = False
        self._body = ""

    def set_extra_http_headers(self, headers):
        self.headers = dict(headers)

    def goto(self, url, timeout=None):
        self._browser.goto_log.append((url, timeout))
        behavior = self._browser.routes.get(url, ("ok", "<html>page</html>"))
        kind, body = behavior[0], behavior[1]
        if kind == "crash":
            raise RuntimeError("browser crashed")
        if kind == "challenge":
            self._body = "<html>Checking your browser</html>"
            return FakeResponse(200)
        if kind == "status":
            self._body = body
            return FakeResponse(behavior[2])
        if kind == "none":  # goto returning None (about:blank)
            self._body = body
            return None
        self._body = body
        return FakeResponse(200)

    def content(self):
        return self._body

    def close(self):
        self.closed = True


class FakeBrowser:
    """Counts launches/pages/closes; routes control per-url behavior."""

    def __init__(self, routes=None):
        self.routes = routes or {}
        self.pages = []
        self.goto_log = []
        self.closed = False

    def new_page(self):
        p = FakePage(self)
        self.pages.append(p)
        return p

    def close(self):
        self.closed = True


def _fetch(urls, browser, **kwargs):
    factory = playwright_transport_factory(
        browser_factory=lambda: browser, **kwargs
    )
    fetcher = LiveFetcher(transport_factory=factory, max_attempts=3)
    batch = pa.table({"url": pa.array(urls, pa.string())})
    return fetcher, fetcher(batch)


def test_launch_once_fetch_many():
    browser = FakeBrowser()
    launches = []
    factory = playwright_transport_factory(
        browser_factory=lambda: (launches.append(1), browser)[1]
    )
    fetcher = LiveFetcher(transport_factory=factory)
    for _ in range(3):  # several batches through ONE browser
        out = fetcher(
            pa.table({"url": pa.array(["http://a/x", "http://a/y"])})
        )
        assert out["fetch_state"].to_pylist() == ["ok", "ok"]
    assert launches == [1]  # init-once per actor
    assert len(browser.pages) == 6  # page per fetch
    assert all(p.closed for p in browser.pages)  # page closed per fetch


def test_headers_and_html_flow():
    browser = FakeBrowser({"http://h/p": ("ok", "<html>body!</html>")})
    _, out = _fetch(["http://h/p"], browser)
    assert out["status"].to_pylist() == [200]
    assert out["html"][0].as_py() == b"<html>body!</html>"
    assert browser.pages[0].headers  # synthesized headers were applied
    assert "user-agent" in browser.pages[0].headers


def test_crash_dead_letters_after_retries():
    browser = FakeBrowser({"http://h/dead": ("crash",)})
    _, out = _fetch(["http://h/dead", "http://h/ok"], browser)
    assert out["fetch_state"].to_pylist() == ["dead_letter", "ok"]
    assert out["status"].to_pylist()[0] == 0
    assert out["attempts"].to_pylist() == [3, 1]
    # crashed pages are still closed (finally path)
    assert all(p.closed for p in browser.pages)


def test_challenge_sniff_retries_through_browser():
    browser = FakeBrowser({"http://h/cf": ("challenge", None)})
    _, out = _fetch(["http://h/cf"], browser)
    # challenge body on every attempt -> dead letter with 3 attempts
    assert out["fetch_state"].to_pylist() == ["dead_letter"]
    assert out["attempts"].to_pylist() == [3]
    assert len(browser.goto_log) == 3


def test_goto_none_is_retryable_status_zero():
    browser = FakeBrowser({"http://h/blank": ("none", "")})
    _, out = _fetch(["http://h/blank"], browser)
    assert out["status"].to_pylist() == [0]
    assert out["fetch_state"].to_pylist() == ["dead_letter"]


def test_non200_status_paths():
    browser = FakeBrowser(
        {
            "http://h/404": ("status", "gone", 404),
            "http://h/503": ("status", "maintenance", 503),
        }
    )
    _, out = _fetch(["http://h/404", "http://h/503"], browser)
    assert out["status"].to_pylist() == [404, 503]
    assert out["fetch_state"].to_pylist() == ["miss", "dead_letter"]
    # 404 is definitive (1 attempt); 503 retried to the cap
    assert out["attempts"].to_pylist() == [1, 3]


def test_cleanup_closes_browser():
    browser = FakeBrowser()
    factory = playwright_transport_factory(browser_factory=lambda: browser)
    transport = factory()
    transport(
        "http://h/x", {"User-Agent": "t"}
    )
    transport.close()
    assert browser.closed


def test_fetcher_del_closes_browser():
    browser = FakeBrowser()
    fetcher, _ = _fetch(["http://h/x"], browser)
    fetcher.__del__()
    assert browser.closed


def test_same_host_pacing():
    from cex_crawler_ray.state.politeness import RobotsPolicy

    sleeps = []
    t = [0.0]

    def clock():
        return t[0]

    def sleep(s):
        sleeps.append(round(s, 6))
        t[0] += s

    browser = FakeBrowser()
    policy = RobotsPolicy(disallow={}, default_delay_ms=500)
    _, out = _fetch(
        ["http://h/1", "http://h/2", "http://other/3"],
        browser,
        robots_policy=policy,
        sleep_fn=sleep,
        clock=clock,
    )
    assert out["fetch_state"].to_pylist() == ["ok", "ok", "ok"]
    # second same-host fetch waited the crawl delay; other host did not
    assert sleeps == [0.5]
