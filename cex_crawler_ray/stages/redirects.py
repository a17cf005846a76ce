"""HTTP redirect-chain resolution — collapse 3xx chains to their final
target.

A real crawl meets redirects constantly (http->https, slash
normalization, site migrations, link shorteners): the frontier must
schedule the FINAL url — otherwise the seen set fills with aliases and
politeness budgets are charged to the wrong host.  Common Crawl's
fetcher follows bounded redirect chains the same way (and records the
hop count); the reference engine never sees them because its url lists
are API responses (reference ``exchange/binance.py:75-136``), but any
link-discovered frontier (reference ``exchange/weex.py:30-60``) hits
them immediately.

``redirect_resolve`` takes the redirect mapping as ``(src, dst)`` rows
(functional: one outgoing edge per src — HTTP gives exactly one
``Location`` per url) and resolves every src to its terminal target by
SUCCESSOR DOUBLING: each round every unresolved pointer jumps to its
target's target and the walked distance doubles, so a depth-D chain
resolves in ceil(log2 D) rounds of ONE co-partition hash self-join
each — the string-keyed sibling of ``graph.pointer_jump_roots``.  Rows
whose current target has no outgoing edge are final; like
``pointer_jump_roots`` they STAY join-visible (an upstream pointer
jumping through a resolved url needs its final), flagged ``done`` so
they stop accumulating hops.  Redirect loops (a->b->a ...) and chains longer than ``max_hops`` never
terminate and are reported as ``status='unresolved'`` — the crawler
drops them, exactly like a fetcher's redirect cap.

Join identity is ``url_hash64`` of the url string — the same 64-bit
canonical-url keyspace the seen filter and the whole frontier already
assume (BASELINE.json north_star: "keyed by canonicalized+hashed URL").

Scale shape: redirect edges are a small fraction of the corpus (only
urls that ARE redirects enter), the shuffle carries (url, cur, hops)
rows — never page payloads — and below ``driver_max_rows`` the chains
solve on the driver with a memoized chase (the repo's standard
small-side fast path, equality-tested against the distributed path).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.canonical import url_hash64_arrow
from .join import hash_join

REDIRECT_DRIVER_MAX_ROWS = 200_000

_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("final_url", pa.string()),
        ("hops", pa.int64()),
        ("status", pa.string()),
    ]
)


def _resolve_driver(
    src: list[str], dst: list[str], max_hops: int
) -> pa.Table:
    """Memoized pointer chase: O(total chain length) with memo, so each
    edge is walked once across all sources."""
    nxt = dict(zip(src, dst))
    # memo: url -> (final_url, hops) or None for loop / over-cap chain
    memo: dict[str, tuple[str, int] | None] = {}

    def chase(u: str) -> tuple[str, int] | None:
        # walk to a terminal / memo hit / loop closure WITHOUT an early
        # length cap (a mid-chain node of an over-cap chain can still
        # be within cap); the cap applies per node at memo-insert time
        path: list[str] = []
        on_path: set[str] = set()
        cur = u
        while True:
            if cur in memo:
                base = memo[cur]
                break
            if cur not in nxt:
                base = (cur, 0)
                break
            if cur in on_path:  # closed a redirect loop
                base = None
                break
            path.append(cur)
            on_path.add(cur)
            cur = nxt[cur]
        for i, node in enumerate(path):
            if base is None:
                memo[node] = None
            else:
                d = base[1] + (len(path) - i)
                memo[node] = (base[0], d) if d <= max_hops else None
        return memo[u] if path else base

    urls, finals, hops_out, status = [], [], [], []
    for u in src:
        got = chase(u)
        urls.append(u)
        if got is None or got[1] > max_hops:
            finals.append("")
            hops_out.append(-1)
            status.append("unresolved")
        else:
            finals.append(got[0])
            hops_out.append(got[1])
            status.append("resolved")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "final_url": pa.array(finals, pa.string()),
            "hops": pa.array(hops_out, pa.int64()),
            "status": pa.array(status, pa.string()),
        }
    )


def _finalize(batch: pa.Table, max_hops: int, resolved: bool) -> pa.Table:
    n = batch.num_rows
    if resolved:
        h = (
            batch["hops"]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ok = h <= max_hops
        final = (
            batch["cur"]
            .combine_chunks()
            .cast(pa.string())
            .to_numpy(zero_copy_only=False)
        )
        final = np.where(ok, final, "")
        h = np.where(ok, h, np.int64(-1))
        status = np.where(ok, "resolved", "unresolved")
        return pa.table(
            {
                "url": batch["url"].cast(pa.string()),
                "final_url": pa.array(final, pa.string()),
                "hops": pa.array(h, pa.int64()),
                "status": pa.array(status, pa.string()),
            }
        )
    return pa.table(
        {
            "url": batch["url"].cast(pa.string()),
            "final_url": pa.array([""] * n, pa.string()),
            "hops": pa.array([-1] * n, pa.int64()),
            "status": pa.array(["unresolved"] * n, pa.string()),
        }
    )


def redirect_resolve(
    edges: "ray.data.Dataset",
    max_hops: int = 8,
    num_parts: int = 64,
    driver_max_rows: int | None = None,
) -> "ray.data.Dataset":
    """Resolve every redirect src to (final_url, hops, status).

    ``edges``: Dataset of (src: string, dst: string), one row per
    redirecting url.  Output: one row per src with ``status`` of
    ``'resolved'`` (terminal reached within ``max_hops``) or
    ``'unresolved'`` (loop or over-cap chain), ``final_url=''`` and
    ``hops=-1`` on the unresolved rows."""
    if driver_max_rows is None:
        driver_max_rows = REDIRECT_DRIVER_MAX_ROWS
    if driver_max_rows > 0:
        edges = edges.materialize()
        if edges.count() <= driver_max_rows:
            tbl = pa.concat_tables(
                ray.get(edges.to_arrow_refs()), promote_options="default"
            )
            return ray.data.from_arrow(
                _resolve_driver(
                    tbl["src"].to_pylist(),
                    tbl["dst"].to_pylist(),
                    max_hops,
                )
            )

    def init_state(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["src"].cast(pa.string()),
                "cur": batch["dst"].cast(pa.string()),
                "hops": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64), pa.int64()
                ),
                "done": pa.array(
                    np.zeros(batch.num_rows, dtype=bool), pa.bool_()
                ),
            }
        )

    # The WHOLE mapping stays in the round state (as in
    # pointer_jump_roots): a resolved row must remain join-visible,
    # because an upstream pointer jumping THROUGH it needs its final
    # (dropping resolved rows would finalize upstream urls at the
    # intermediate hop).  ``done`` rows stop accumulating hops and
    # propagate their done-ness to rows that land on them.
    state = edges.map_batches(
        init_state, batch_format="pyarrow"
    ).materialize()
    rounds = max(1, math.ceil(math.log2(max(2, max_hops)))) + 2

    for _ in range(rounds):
        undone = int(
            state.map_batches(
                lambda b: pa.table(
                    {
                        "u": pa.array(
                            [
                                b.num_rows
                                - pc.sum(
                                    b["done"].combine_chunks().cast(pa.int64())
                                ).as_py()
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("u")
            or 0
        )
        if undone == 0:
            break

        def with_h(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "h",
                pa.array(
                    url_hash64_arrow(batch["cur"]).astype(np.int64),
                    pa.int64(),
                ),
            )

        def lookup_side(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "h2": pa.array(
                        url_hash64_arrow(batch["url"]).astype(np.int64),
                        pa.int64(),
                    ),
                    "cur2": batch["cur"],
                    "hops2": batch["hops"],
                    "done2": batch["done"],
                }
            )

        left = state.map_batches(with_h, batch_format="pyarrow")
        lookup = state.map_batches(lookup_side, batch_format="pyarrow")
        joined = hash_join(
            left, lookup, left_key="h", right_key="h2",
            num_parts=num_parts, how="left",
        )

        def step(df: "pd.DataFrame") -> pa.Table:
            done = df["done"].to_numpy(bool)
            matched = df["cur2"].notna().to_numpy()
            m = matched & ~done  # rows that actually jump this round
            hops = df["hops"].to_numpy(np.int64)
            hops2 = df["hops2"].fillna(0).to_numpy(np.int64)
            cur = df["cur"].to_numpy(object)
            cur2 = df["cur2"].to_numpy(object)
            done2 = df["done2"].fillna(False).to_numpy(bool)
            # unmatched undone rows sit on a terminal -> done; a jump
            # onto a done row lands on ITS final -> done too
            new_done = done | (~matched) | (m & done2)
            return pa.table(
                {
                    "url": pa.array(df["url"].to_numpy(object), pa.string()),
                    "cur": pa.array(np.where(m, cur2, cur), pa.string()),
                    "hops": pa.array(
                        np.where(m, hops + hops2, hops), pa.int64()
                    ),
                    "done": pa.array(new_done, pa.bool_()),
                }
            )

        state = joined.map_batches(step, batch_format="pandas").materialize()

    def classify(batch: pa.Table) -> pa.Table:
        done_mask = batch["done"].combine_chunks()
        fin = _finalize(batch.filter(done_mask), max_hops, resolved=True)
        rest = _finalize(
            batch.filter(pc.invert(done_mask)), max_hops, resolved=False
        )
        return pa.concat_tables([fin, rest])

    return state.map_batches(classify, batch_format="pyarrow")
