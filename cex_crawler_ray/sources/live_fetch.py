"""Live fetch actor pool: the production-shaped HTTP/browser stage.

The reference holds one Playwright browser per worker process for its
whole lifetime (``exchange/base_scraper.py:78-143``: launch in setup,
``page.goto`` + content per url, teardown at exit) and wraps fetches in
a bounded content-sniff retry loop — bithumb retries up to 3 times when
the returned page smells like a Cloudflare challenge
(``exchange/bithumb.py:28-72``).

Ray-Data-native shape: a CALLABLE CLASS passed to ``map_batches(...,
concurrency=N)`` — the transport session is built once per actor in
``__init__`` (browser/HTTP-client analog), each ``__call__`` fetches a
batch with per-url bounded retries and deterministic backoff
accounting.  Failures are never dropped: after ``max_attempts`` the url
becomes a DEAD-LETTER row (``status`` = last status, ``fetch_state`` =
'dead_letter') that flows through extraction as a miss, so the crawl
loop's metrics and checkpoints see every url exactly once.

The transport is injectable: production would pass an HTTP session
factory; this sandbox passes the PageStore-backed transport (the
simulated internet) or a flaky wrapper in tests.  M16 header synthesis
(``functions/headers.py``) runs per request as a hook.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.headers import synth_headers

# content sniff: a "page" that is actually an interstitial challenge
CHALLENGE_MARKERS = (b"cf-challenge", b"Checking your browser")


class LiveFetcher:
    """map_batches callable class (actor pool).

    ``transport_factory() -> transport`` is called ONCE per actor;
    ``transport(url, headers) -> (status:int, html:bytes|None,
    warc_ts)`` is called per attempt.  Retries: non-200 status or a
    challenge-marker body retries up to ``max_attempts`` with
    deterministic exponential backoff *accounting* (recorded in
    ``backoff_ms_total``; actual sleeping is the politeness layer's
    job — the crawl's token budget already paces hosts, reference
    analog ``base_scraper.py:160-181``).
    """

    def __init__(
        self,
        transport_factory,
        max_attempts: int = 3,
        base_backoff_ms: int = 250,
        header_seed: int = 0,
        sleep_fn=None,
        breaker_threshold: int | None = None,
        breaker_cooldown_s: float = 60.0,
        clock=None,
    ):
        self.transport = transport_factory()  # per-actor session
        self.max_attempts = max_attempts
        self.base_backoff_ms = base_backoff_ms
        self.header_seed = header_seed
        self.sleep_fn = sleep_fn  # injectable for tests; None = no sleep
        # per-host circuit breaker (ACTOR-LOCAL by design: each actor
        # independently discovers a sick host; no cross-actor
        # coordination needed — a few extra probes per actor is the
        # cost of lock-free operation).  After `breaker_threshold`
        # consecutive dead-letters for a host, its rows fail fast as
        # 'circuit_open' until `breaker_cooldown_s` passes; the first
        # row after cooldown is the half-open probe.
        self.breaker_threshold = breaker_threshold
        self.breaker_cooldown_s = breaker_cooldown_s
        self._clock = clock  # injectable monotonic clock for tests
        self._host_fails: dict = {}
        self._host_open_until: dict = {}

    def __del__(self):  # actor teardown: release browser/session
        close = getattr(self.transport, "close", None)
        if callable(close):
            try:
                close()
            except Exception:
                pass

    def _fetch_one(self, url: str, if_modified_since=None):
        attempts = 0
        backoff_total = 0
        status, html, warc_ts = 0, None, None
        while attempts < self.max_attempts:
            headers = synth_headers(url, self.header_seed + attempts)
            if if_modified_since is not None:
                # conditional GET (RFC 9110 §13.1.3): IMF-fixdate form
                headers["If-Modified-Since"] = if_modified_since.strftime(
                    "%a, %d %b %Y %H:%M:%S GMT"
                )
            attempts += 1
            res = self.transport(url, headers)
            # transports may return (status, html, warc_ts) or a
            # 4-tuple with a Retry-After value in seconds (429/503)
            status, html, warc_ts = res[0], res[1], res[2]
            retry_after_s = res[3] if len(res) > 3 else None
            challenged = html is not None and any(
                m in html for m in CHALLENGE_MARKERS
            )
            if status == 200 and not challenged:
                return status, html, warc_ts, attempts, backoff_total, "ok"
            if status == 304:
                # conditional GET hit: content unchanged since the
                # caller's If-Modified-Since — keep the stored copy
                return (
                    status,
                    None,
                    warc_ts,
                    attempts,
                    backoff_total,
                    "not_modified",
                )
            if status == 404:
                # definitive miss: retrying cannot help (the reference
                # only loops on challenge/5xx, not not-found)
                return status, None, warc_ts, attempts, backoff_total, "miss"
            if attempts < self.max_attempts:
                wait = self.base_backoff_ms * (2 ** (attempts - 1))
                if status in (429, 503) and retry_after_s is not None:
                    # server-directed pacing (RFC 9110 Retry-After)
                    # wins over our own exponential schedule
                    wait = max(wait, int(retry_after_s * 1000))
                backoff_total += wait
                if self.sleep_fn is not None:
                    self.sleep_fn(wait / 1000.0)
        return status, None, warc_ts, attempts, backoff_total, "dead_letter"

    def _fetch_guarded(self, url: str, if_modified_since=None):
        if self.breaker_threshold is None:
            return self._fetch_one(url, if_modified_since)
        import time as _time
        from urllib.parse import urlsplit

        host = urlsplit(url).netloc.lower().partition(":")[0]
        now = (self._clock or _time.monotonic)()
        open_until = self._host_open_until.get(host)
        if open_until is not None and now < open_until:
            return 0, None, None, 0, 0, "circuit_open"
        res = self._fetch_one(url, if_modified_since)
        state = res[5]
        if state == "dead_letter":
            n = self._host_fails.get(host, 0) + 1
            self._host_fails[host] = n
            if n >= self.breaker_threshold:
                self._host_open_until[host] = (
                    now + self.breaker_cooldown_s
                )
        else:
            self._host_fails[host] = 0
            self._host_open_until.pop(host, None)
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        # optional recrawl column: per-url last-fetch timestamp drives
        # a conditional GET; 304 rows come back state='not_modified'
        ims = (
            batch["if_modified_since"].to_pylist()
            if "if_modified_since" in batch.column_names
            else [None] * len(urls)
        )
        statuses = np.empty(len(urls), dtype=np.int32)
        htmls: list = []
        warcs: list = []
        attempts = np.empty(len(urls), dtype=np.int32)
        backoffs = np.empty(len(urls), dtype=np.int64)
        states: list = []
        for i, u in enumerate(urls):
            s, h, w, a, b, st = self._fetch_guarded(u, ims[i])
            statuses[i] = s
            htmls.append(h)
            warcs.append(w)
            attempts[i] = a
            backoffs[i] = b
            states.append(st)
        return (
            batch.append_column("status", pa.array(statuses, pa.int32()))
            .append_column(
                "warc_ts", pa.array(warcs, pa.timestamp("us", tz="UTC"))
            )
            .append_column("html", pa.array(htmls, pa.binary()))
            .append_column("attempts", pa.array(attempts, pa.int32()))
            .append_column(
                "backoff_ms_total", pa.array(backoffs, pa.int64())
            )
            .append_column("fetch_state", pa.array(states, pa.string()))
        )


def store_transport_factory(store_path: str, num_buckets: int):
    """The sandbox 'network': resolve urls against the bucketed page
    store, through the same worker-global bucket cache the batch fetch
    uses.  Returns a factory suitable for ``LiveFetcher``."""

    def factory():
        from .page_store import _fetch_batch

        def transport(url: str, headers: dict):
            t = pa.table({"url": pa.array([url], pa.string())})
            out = _fetch_batch(t, store_path, num_buckets)
            status = out["status"][0].as_py()
            html = out["html"][0].as_py() if "html" in out.column_names else None
            warc = (
                out["warc_ts"][0].as_py()
                if "warc_ts" in out.column_names
                else None
            )
            return status, html, warc

        return transport

    return factory


def http_transport_factory(
    robots_policy=None,
    timeout_s: float = 20.0,
    sleep_fn=None,
    clock=None,
):
    """Production HTTP transport: one ``requests.Session`` per actor.

    The reference's non-browser fallback is a per-scraper ``requests``
    client with synthesized headers (reference
    ``exchange/base_scraper.py:242-253``); its pacing is a
    ``random_delay`` sleep between sequential fetches
    (``base_scraper.py:160-181``).  Here pacing is deterministic and
    robots-aware: when ``robots_policy`` is given, consecutive requests
    to the SAME host from this actor are spaced by the host's
    ``crawl_delay_ms`` (falling back to the policy default) via the
    injectable ``sleep_fn`` — unrelated hosts are never delayed, and
    the crawl loop's token budget still bounds per-round volume.

    ``requests`` is imported lazily inside the factory, so the module
    stays importable without it.  Transport errors (timeouts, refused
    connections) surface as status 0 with no body — retryable by
    ``LiveFetcher``'s backoff loop, dead-lettered after
    ``max_attempts``.  Non-200 bodies are returned so the challenge
    sniff sees interstitial pages served with any status.
    """

    def factory():
        import datetime as _dt
        import time as _time
        from urllib.parse import urlsplit

        import requests  # optional dep; only needed for this factory

        sess = requests.Session()
        sleep = sleep_fn if sleep_fn is not None else _time.sleep
        now = clock if clock is not None else _time.monotonic
        last_req: dict = {}  # host -> monotonic ts of the last request

        def transport(url: str, headers: dict):
            host = urlsplit(url).netloc.lower().partition(":")[0]
            if robots_policy is not None:
                delay_s = (
                    robots_policy.crawl_delay_ms.get(
                        host, robots_policy.default_delay_ms
                    )
                    / 1000.0
                )
                prev = last_req.get(host)
                if prev is not None:
                    wait = delay_s - (now() - prev)
                    if wait > 0:
                        sleep(wait)
            retry_after_s = None
            try:
                resp = sess.get(url, headers=headers, timeout=timeout_s)
                status = resp.status_code
                html = resp.content
                ra = resp.headers.get("Retry-After")
                if ra is not None:
                    try:  # delta-seconds form only (date form is rare)
                        retry_after_s = float(ra)
                    except ValueError:
                        pass
            except requests.RequestException:
                status, html = 0, None
            last_req[host] = now()
            warc_ts = _dt.datetime.now(_dt.timezone.utc)
            return status, html, warc_ts, retry_after_s

        return transport

    return factory


def playwright_transport_factory(
    robots_policy=None,
    timeout_s: float = 30.0,
    sleep_fn=None,
    clock=None,
    browser_factory=None,
    browser: str = "chromium",
    launch_kwargs: dict | None = None,
):
    """Headless-browser transport: one Playwright browser per actor.

    Mirrors the reference's browser lifecycle
    (``exchange/base_scraper.py:78-143``): launch ONCE in actor setup,
    one ``new_page`` + ``goto`` + ``content`` per fetch, page closed
    per fetch, browser closed at actor teardown (``transport.close()``,
    invoked by ``LiveFetcher.__del__``).  The JS-challenge retry loop
    stays in ``LiveFetcher`` — a challenge body returned through this
    transport hits the same content-sniff path as the HTTP transport.

    ``playwright`` is imported lazily inside the factory so the module
    stays importable without it (this container has no browser engine —
    the seam is exercised by a stub via ``browser_factory``, which must
    return an object with the sync-Playwright browser surface:
    ``new_page() -> page`` with ``set_extra_http_headers(dict)``,
    ``goto(url, timeout=ms) -> resp(.status)``, ``content() -> str``,
    ``close()``; and ``close()`` on the browser itself).

    Per-host pacing is identical to ``http_transport_factory``: when
    ``robots_policy`` is given, consecutive same-host requests from
    this actor are spaced by the host's crawl delay.  Any exception
    from the browser (crash, nav timeout, closed context) surfaces as
    status 0 with no body — retried then dead-lettered by
    ``LiveFetcher``, never raised into the Ray task.
    """

    def factory():
        import datetime as _dt
        import time as _time
        from urllib.parse import urlsplit

        if browser_factory is not None:
            pw, br = None, browser_factory()
        else:  # pragma: no cover - needs a real browser install
            from playwright.sync_api import sync_playwright

            pw = sync_playwright().start()
            br = getattr(pw, browser).launch(
                headless=True, **(launch_kwargs or {})
            )

        sleep = sleep_fn if sleep_fn is not None else _time.sleep
        now = clock if clock is not None else _time.monotonic
        last_req: dict = {}

        def transport(url: str, headers: dict):
            host = urlsplit(url).netloc.lower().partition(":")[0]
            if robots_policy is not None:
                delay_s = (
                    robots_policy.crawl_delay_ms.get(
                        host, robots_policy.default_delay_ms
                    )
                    / 1000.0
                )
                prev = last_req.get(host)
                if prev is not None:
                    wait = delay_s - (now() - prev)
                    if wait > 0:
                        sleep(wait)
            status, html = 0, None
            page = None
            try:
                page = br.new_page()
                page.set_extra_http_headers(headers)
                resp = page.goto(url, timeout=timeout_s * 1000)
                # goto may legally return None (about:blank etc.)
                status = resp.status if resp is not None else 0
                body = page.content()
                html = (
                    body.encode("utf-8") if isinstance(body, str) else body
                )
            except Exception:
                status, html = 0, None
            finally:
                if page is not None:
                    try:
                        page.close()
                    except Exception:
                        pass
            last_req[host] = now()
            warc_ts = _dt.datetime.now(_dt.timezone.utc)
            return status, html, warc_ts

        def close():
            try:
                br.close()
            except Exception:
                pass
            if pw is not None:
                try:
                    pw.stop()
                except Exception:
                    pass

        transport.close = close
        return transport

    return factory


def live_fetch(
    frontier,
    transport_factory,
    concurrency=(1, 4),
    batch_size: int = 256,
    max_attempts: int = 3,
    **fetcher_kwargs,
):
    """Wire a frontier Dataset (or Arrow table) through the actor pool.

    Drop-in alternative to ``PageStore.fetch_aligned`` for the crawl
    loop (``CrawlConfig.fetch_fn``): output carries the same
    (frontier + status + warc_ts + html) columns plus the retry
    telemetry (attempts, backoff_ms_total, fetch_state).
    """
    import ray

    if isinstance(frontier, pa.Table):
        frontier = ray.data.from_arrow(frontier)
    return frontier.map_batches(
        LiveFetcher,
        fn_constructor_kwargs={
            "transport_factory": transport_factory,
            "max_attempts": max_attempts,
            **fetcher_kwargs,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
