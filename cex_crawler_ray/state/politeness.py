"""Per-host politeness + robots.txt: deterministic token buckets.

The reference throttles with ``random.uniform`` sleeps inside one
sequential loop per site (reference ``exchange/base_scraper.py:160-181``,
call sites e.g. ``exchange/binance.py:284``) and obeys no robots.txt at
all.  At cluster scale, politeness must be decoupled from parallelism:
here each host gets a *deterministic* token budget per crawl round
(tokens ≈ round_seconds / crawl_delay), so the fetch order is
reproducible (north_rule: matching crawl ordering under the same
politeness budget) while unrelated hosts proceed in parallel.

``RobotsPolicy`` is a small immutable rule table (host -> disallowed
path prefixes + crawl delay) broadcast once via ``ray.put`` and read
inside fetch tasks — never re-shipped per batch.  In a live crawl the
fetch actors would lazily fill a per-actor robots cache keyed by host
(the reference's buildId-cache pattern, ``exchange/gate.py:52``).
"""

from __future__ import annotations

import re as _re
from urllib.parse import urlsplit

# RFC 9309 §2.2.3 special characters in rule paths: '*' matches any
# run of octets, '$' anchors the end.  Plain rules (the overwhelming
# majority) keep the prefix fast path; wildcard rules compile once
# into a process-global memo.
_RULE_RE_CACHE: dict = {}


def _rule_matches(rule: str, path: str) -> bool:
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)
    rx = _RULE_RE_CACHE.get(rule)
    if rx is None:
        pat = rule
        anchored = pat.endswith("$")
        if anchored:
            pat = pat[:-1]
        pat = "".join(
            ".*" if c == "*" else _re.escape(c) for c in pat
        )
        rx = _re.compile("^" + pat + ("$" if anchored else ""))
        _RULE_RE_CACHE[rule] = rx
    return rx.match(path) is not None


class RobotsPolicy:
    def __init__(
        self,
        disallow: dict | None = None,
        crawl_delay_ms: dict | None = None,
        default_delay_ms: int = 1000,
        sitemaps: dict | None = None,
        allow: dict | None = None,
    ):
        self.disallow = {h: tuple(p) for h, p in (disallow or {}).items()}
        # RFC 9309 Allow rules: only consulted when a Disallow also
        # matches — longest match wins, Allow wins a length tie
        self.allow = {h: tuple(p) for h, p in (allow or {}).items()}
        self.crawl_delay_ms = dict(crawl_delay_ms or {})
        self.default_delay_ms = default_delay_ms
        # host -> tuple of sitemap urls (RFC 9309: Sitemap lines are
        # independent of user-agent groups)
        self.sitemaps = {
            h: tuple(s) for h, s in (sitemaps or {}).items()
        }

    def allowed(self, url: str) -> bool:
        parts = urlsplit(url)
        host = parts.netloc.lower().partition(":")[0]
        path = parts.path or "/"
        dis = max(
            (
                len(p)
                for p in self.disallow.get(host, ())
                if _rule_matches(p, path)
            ),
            default=-1,
        )
        if dis < 0:
            return True
        alw = max(
            (
                len(p)
                for p in self.allow.get(host, ())
                if _rule_matches(p, path)
            ),
            default=-1,
        )
        # RFC 9309 §2.2.2: most specific (longest rule string) wins;
        # Allow wins an exact length tie
        return alw >= dis

    def tokens_per_round(self, host: str, round_ms: int = 10_000) -> int:
        """Deterministic per-round fetch budget for a host."""
        delay = self.crawl_delay_ms.get(host, self.default_delay_ms)
        return max(1, round_ms // max(1, delay))

    def hosts_with_rules(self) -> frozenset:
        """Hosts that have at least one disallow prefix — the gate
        short-circuits every other host without a per-URL call."""
        return frozenset(h for h, p in self.disallow.items() if p)

    @classmethod
    def from_robots_txt(
        cls,
        texts: dict,
        user_agent: str = "*",
        default_delay_ms: int = 1000,
    ) -> "RobotsPolicy":
        """Build a policy from raw robots.txt bodies (host -> text).

        Standard-format subset following RFC 9309 group semantics:
        consecutive ``User-agent`` lines form ONE group sharing the
        rule lines that follow; groups naming the same agent combine;
        a matched specific-agent group wins entirely over the ``*``
        group — even when the specific group has no rules (allow all).
        ``Disallow`` path prefixes (empty = allow all), ``Crawl-delay``
        seconds.  Unknown directives are ignored; a fetch pipeline
        caches one parsed policy per host exactly like the reference
        caches its buildId (``exchange/gate.py:52``)."""
        disallow: dict = {}
        allow: dict = {}
        delays: dict = {}
        sitemaps: dict = {}
        ua = user_agent.lower()
        for host, text in texts.items():
            # Parse into groups: each is {agents, rules, delay}.
            groups: list = []
            cur: dict | None = None
            in_ua_run = False
            for raw in (text or "").splitlines():
                line = raw.split("#", 1)[0].strip()
                if not line or ":" not in line:
                    continue
                key, _, val = line.partition(":")
                key = key.strip().lower()
                val = val.strip()
                if key == "user-agent":
                    if not in_ua_run:
                        cur = {
                            "agents": set(),
                            "rules": [],
                            "allows": [],
                            "delay": None,
                        }
                        groups.append(cur)
                        in_ua_run = True
                    cur["agents"].add(val.lower())
                elif key == "sitemap":
                    # sitemaps.org protocol: Sitemap lines sit outside
                    # user-agent groups (RFC 9309 treats them as
                    # other-record lines)
                    in_ua_run = False
                    if val:
                        sitemaps.setdefault(host, []).append(val)
                elif key in ("disallow", "allow", "crawl-delay"):
                    in_ua_run = False
                    if cur is None:
                        continue
                    if key == "disallow":
                        if val:
                            cur["rules"].append(val)
                    elif key == "allow":
                        if val:
                            cur["allows"].append(val)
                    else:
                        try:
                            cur["delay"] = int(float(val) * 1000)
                        except ValueError:
                            pass
            # Most-specific match wins entirely; same-agent groups merge.
            matched = [g for g in groups if ua in g["agents"]]
            if not matched:
                matched = [g for g in groups if "*" in g["agents"]]
            rules: list = []
            allows: list = []
            delay = None
            for g in matched:
                rules.extend(g["rules"])
                allows.extend(g["allows"])
                if delay is None:
                    delay = g["delay"]
            disallow[host] = rules
            if allows:
                allow[host] = allows
            if delay is not None:
                delays[host] = delay
        return cls(
            disallow=disallow,
            crawl_delay_ms=delays,
            default_delay_ms=default_delay_ms,
            sitemaps=sitemaps,
            allow=allow,
        )


class AdaptiveDelay:
    """AIMD per-host crawl-delay adaptation (TCP-congestion-shaped).

    Robots ``Crawl-delay`` is a static floor; a polite production
    crawler ALSO backs off when the server signals pressure (429/503)
    and re-accelerates gently when fetches succeed — multiplicative
    increase of the delay on throttle signals, additive decrease toward
    the floor on clean rounds.  The reference sleeps a fixed random
    interval regardless of server responses (reference
    ``exchange/base_scraper.py:160-181``).

    Deterministic by construction (no randomness, no wall clock): the
    multiplier is a pure fold over the observed (ok, throttled) round
    counts, so crawl ordering stays reproducible (north_rule) with
    adaptation enabled.  State is one float per host that ever
    throttled — driver-held, bounded by host cardinality, checkpointed
    trivially."""

    def __init__(
        self,
        increase: float = 2.0,
        decrease: float = 0.25,
        max_mult: float = 16.0,
    ):
        self.increase = increase
        self.decrease = decrease
        self.max_mult = max_mult
        self.mult: dict = {}

    def observe(self, host: str, n_ok: int, n_throttled: int) -> None:
        m = self.mult.get(host, 1.0)
        if n_throttled > 0:
            m = min(self.max_mult, m * self.increase)
        elif n_ok > 0:
            m = max(1.0, m - self.decrease)
        if m == 1.0:
            self.mult.pop(host, None)
        else:
            self.mult[host] = m

    def tokens_per_round(
        self, robots: "RobotsPolicy", host: str, round_ms: int
    ) -> int:
        base = robots.crawl_delay_ms.get(host, robots.default_delay_ms)
        eff = base * self.mult.get(host, 1.0)
        return max(1, int(round_ms // max(1.0, eff)))


def audit_fetch_gaps(
    log_ds,
    host_col: str = "host",
    ts_col: str = "ts_s",
    delay_col: str = "required_delay_s",
    num_parts: int = 64,
):
    """Politeness COMPLIANCE audit over a fetch log — the operational
    check a crawl runs after the fact: did the scheduler actually honor
    each host's crawl-delay?  (The reference engine sleeps inline,
    `exchange/base_scraper.py` 2-5 s loops, and never verifies; at
    fleet scale verification is how you catch a mis-sharded host.)

    Input rows: (host, fetch epoch-seconds, required delay seconds —
    constant per host).  ONE host-hash co-partition moves slim
    (host, ts, delay) rows; inside each partition the per-host gap
    sequence is a vectorized sort + diff.  Returns per host:
    n_fetches, min_gap_s (null when the host fetched once),
    n_violations (gaps strictly under the required delay),
    required_delay_s.  Gap multiset depends only on the sorted ts
    sequence, so any tie order reproduces the same counts.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cex_crawler_ray.stages.dedup import (
        _coarse_group_apply,
        _hash64,
    )

    def tag(batch: pa.Table) -> pa.Table:
        kh = pa.array(
            [_hash64(h) for h in batch[host_col].to_pylist()],
            pa.uint64(),
        )
        return batch.select(
            [host_col, ts_col, delay_col]
        ).append_column("_kh", kh)

    def audit(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(
            [host_col, ts_col], kind="mergesort"
        )
        hosts, n_f, min_g, n_v, req = [], [], [], [], []
        for h, g in df.groupby(host_col, sort=True):
            ts = g[ts_col].to_numpy(np.int64)
            gaps = np.diff(ts)
            d = int(g[delay_col].iloc[0])
            hosts.append(h)
            n_f.append(len(ts))
            min_g.append(int(gaps.min()) if len(gaps) else None)
            n_v.append(int((gaps < d).sum()))
            req.append(d)
        return pa.table(
            {
                host_col: pa.array(hosts, pa.string()),
                "n_fetches": pa.array(n_f, pa.int64()),
                "min_gap_s": pa.array(min_g, pa.int64()),
                "n_violations": pa.array(n_v, pa.int64()),
                delay_col: pa.array(req, pa.int64()),
            }
        )

    return _coarse_group_apply(
        log_ds.map_batches(tag, batch_format="pyarrow"),
        "_kh",
        audit,
        num_parts=num_parts,
    )
