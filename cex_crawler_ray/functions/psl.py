"""Public-suffix-list matching — registrable domain (eTLD+1) per host.

Real crawl politeness, seen-set partitioning and per-site budgets key
on the REGISTRABLE domain, not the raw host (``a.b.example.co.uk``
must share ``example.co.uk``'s budget) — the reference never needs
this because its 14 hosts are hardcoded, but a link-discovered
frontier meets arbitrary hosts immediately.  This implements the
publicsuffix.org algorithm (exact rules, ``*.`` wildcard rules that
consume exactly one label, ``!`` exception rules that prevail over
everything, longest-match-wins, implicit ``*`` default) against an
arbitrary rule set passed as data — no network, no bundled snapshot;
tests and queries supply deterministic rule sets.

Vectorization: rules are grouped by label count into plain Python sets
broadcast inside the closure (the full real-world PSL is ~9k rules —
kilobytes).  Matching is O(max_rule_labels) vector passes, NOT
O(rules): for each k up to the longest rule, the last-k-label suffix
of every host is extracted with one ``pyarrow.compute.extract_regex``
and membership-tested with one ``pc.is_in`` against that k's rule set.
Exceptions override, then the longest matching rule wins, then the
default rule (suffix = last label).  Hosts that ARE a public suffix
get ``registrable = ''`` (the spec's nil answer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def parse_rules(rules: list[str]) -> dict:
    """Split a PSL rule list into per-label-count lookup sets."""
    exact: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            body = r[1:]
            exc.setdefault(body.count(".") + 1, set()).add(body)
        elif r.startswith("*."):
            base = r[2:]
            wild.setdefault(base.count(".") + 1, set()).add(base)
        else:
            exact.setdefault(r.count(".") + 1, set()).add(r)
    return {"exact": exact, "wild": wild, "exc": exc}


def _last_k_labels(hosts: pa.Array, k: int) -> pa.Array:
    """Vectorized last-k-labels suffix ('' where the host is shorter)."""
    if k == 1:
        pat = r"(?P<s>[^.]+)$"
    else:
        pat = r"(?P<s>(?:[^.]+\.){%d}[^.]+)$" % (k - 1)
    ex = pc.extract_regex(hosts, pat)
    got = pc.struct_field(ex, "s")
    return pc.fill_null(got, "")


def suffix_and_registrable(
    hosts: pa.Array, parsed: dict
) -> tuple[pa.Array, pa.Array]:
    """Per host: (public_suffix, registrable_domain).

    ``hosts`` must be lowercase dotted names.  Returns registrable ''
    where the host is itself (or shorter than) a public suffix."""
    hosts = hosts.combine_chunks() if isinstance(
        hosts, pa.ChunkedArray
    ) else hosts
    n = len(hosts)
    n_labels = pc.add(
        pc.count_substring(hosts, "."), 1
    ).to_numpy(zero_copy_only=False)

    ks = sorted(
        set(parsed["exact"]) | set(parsed["wild"]) | set(parsed["exc"])
    )
    max_k = max(ks) if ks else 0

    # suffix label count per row: default rule '*' = 1 label
    suf = np.ones(n, dtype=np.int64)
    exc_hit = np.zeros(n, dtype=bool)
    # cache the last-k suffix arrays; also needed for extraction below
    # (up to max_k+2: a wildcard match at max_k yields a suffix of
    # max_k+1 labels, whose registrable is the last max_k+2 labels)
    lastk: dict[int, pa.Array] = {}
    for k in range(1, max_k + 3):
        lastk[k] = _last_k_labels(hosts, k)

    for k in ks:
        lk = lastk[k]
        if k in parsed["exact"]:
            m = pc.is_in(
                lk, value_set=pa.array(sorted(parsed["exact"][k]))
            ).to_numpy(zero_copy_only=False)
            suf = np.where(m & ~exc_hit & (k > suf), k, suf)
        if k in parsed["wild"]:
            m = pc.is_in(
                lk, value_set=pa.array(sorted(parsed["wild"][k]))
            ).to_numpy(zero_copy_only=False)
            # '*' consumes exactly one extra label, which must exist
            m = m & (n_labels >= k + 1)
            suf = np.where(m & ~exc_hit & (k + 1 > suf), k + 1, suf)
        if k in parsed["exc"]:
            m = pc.is_in(
                lk, value_set=pa.array(sorted(parsed["exc"][k]))
            ).to_numpy(zero_copy_only=False)
            # exception rule: its own labels MINUS the leftmost form
            # the suffix, and it prevails over every other rule
            suf = np.where(m, max(k - 1, 1), suf)
            exc_hit |= m

    # assemble outputs: one vectorized take per distinct label count
    host_np = np.asarray(hosts.to_numpy(zero_copy_only=False), dtype=object)
    suffix_out = np.empty(n, dtype=object)
    reg_out = np.empty(n, dtype=object)
    for k in np.unique(suf):
        rows = suf == k
        sk = lastk[int(k)].to_numpy(zero_copy_only=False)
        rk = (
            lastk[int(k) + 1].to_numpy(zero_copy_only=False)
            if int(k) + 1 in lastk
            else np.full(n, "", dtype=object)
        )
        suffix_out[rows] = sk[rows]
        reg_out[rows] = rk[rows]
    # host itself a public suffix (or shorter): nil registrable
    short = n_labels <= suf
    suffix_out[short] = host_np[short]
    reg_out[short] = ""
    return (
        pa.array(suffix_out, pa.string()),
        pa.array(reg_out, pa.string()),
    )
