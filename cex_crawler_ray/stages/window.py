r"""Globally-ordered window operators (LEAD/LAG) and fixed-point
PageRank over an edge Dataset.

The reference engine has no window or graph analytics at all — its
closest analog is the per-site "previous announcement" bookkeeping
(reference ``exchange/base_scraper.py`` seen-URL set).  A web-scale
crawler needs both: LEAD/LAG over a globally time-ordered event stream
(session handoffs, inter-arrival gaps) and link-graph centrality to
prioritize the frontier.

``lead_lag`` — LEAD/LAG over a global (ts, tiebreak) order WITHOUT a
global sort.  Same two-pass shape as ``stages/pack.py``'s distributed
prefix sum:

1. pass 1 (combiner): per-batch, per COARSE time bucket, keep only the
   first+last row (by order key).  The groupby shuffle carries two rows
   per (batch, bucket); only one merged first/last row per bucket
   reaches the driver (10^10 events / hourly buckets ≈ 10^5 rows),
   which builds the bucket -> neighbor-bucket-boundary map.
2. pass 2: ``groupby(bucket).map_groups`` — within-bucket vectorized
   shift plus the broadcast neighbor boundary value for the edge row.

No per-event state ever reaches the driver; bucket granularity is the
partition key, so skewed hours degrade to bigger groups, not hot keys.

``pagerank`` — damping-0.85 PageRank in *integer fixed point* (ranks
are int64 micro-units, contributions are exact floor divisions), which
makes the result bit-reproducible regardless of summation order — the
same property the repo's cents-scaled SUM oracles rely on — so an
unrolled-CTE DuckDB oracle can hash-match it exactly.  Below
``driver_max_edges`` the (src, dst) int64 pairs are solved vectorized
on the driver (same threshold-switch as ``CC_DRIVER_MAX_PAIRS``);
above it each iteration is one co-partition hash join (static
edges+outdeg table x current ranks) and one coarse-partition sum —
the label-propagation shape of ``connected_components``.  Dangling
nodes follow the standard simplification (their mass is dropped, the
0.15 teleport keeps ranks positive).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .dedup import _coarse_group_apply
from .join import hash_join

# one hour in microseconds — the default coarse order bucket
DEFAULT_BUCKET_US = 3_600_000_000


def _order_key_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    ts = batch[ts_col].combine_chunks()
    if pa.types.is_timestamp(ts.type):
        ts = ts.cast(pa.timestamp("us"))
    return ts.cast(pa.int64()).to_numpy(zero_copy_only=False)


def lead_lag(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "user_id",
    kind: str = "lead",
    bucket_us: int = DEFAULT_BUCKET_US,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """LEAD/LAG of ``value_col`` over the global (ts, tiebreak) order.

    Returns columns ``(tiebreak_col, ts_us, value_col, out_col)`` —
    ``out_col`` (default ``{kind}_{value_col}``) is null for the last
    (lead) / first (lag) row of the stream.
    """
    if kind not in ("lead", "lag"):
        raise ValueError(kind)
    out = out_col or f"{kind}_{value_col}"

    # the boundary pass and the tag pass both consume ds — pin it so
    # the upstream read/transform chain executes once
    ds = ds.materialize()

    # pass 1: per-bucket first & last row -> tiny driver table
    def boundary_partial(batch: pa.Table) -> pa.Table:
        us = _order_key_us(batch, ts_col)
        tie = batch[tiebreak_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        val = batch[value_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bkt = us // bucket_us
        order = np.lexsort((tie, us, bkt))
        bkt_s = bkt[order]
        first = np.concatenate(([True], bkt_s[1:] != bkt_s[:-1]))
        last = np.concatenate((bkt_s[1:] != bkt_s[:-1], [True]))
        keep = order[first | last]
        return pa.table(
            {
                "bkt": pa.array(bkt[keep], pa.int64()),
                "us": pa.array(us[keep], pa.int64()),
                "tie": pa.array(tie[keep], pa.int64()),
                "val": pa.array(val[keep], pa.int64()),
            }
        )

    # The per-block boundary partials are already tiny (<= 2 rows per
    # (block, bucket)) and the merged result is consumed ON THE DRIVER
    # either way — so merge here with one numpy lexsort instead of
    # paying a full shuffle round just to pre-shrink rows the driver
    # was about to hold anyway.  (This halved lead_lag wall time; the
    # driver's row bound is unchanged up to the block-overlap factor.)
    bounds_tbl = pa.concat_tables(
        ray.get(
            ds.map_batches(
                boundary_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    b_bkt = bounds_tbl["bkt"].to_numpy(zero_copy_only=False).astype(np.int64)
    b_us = bounds_tbl["us"].to_numpy(zero_copy_only=False).astype(np.int64)
    b_tie = bounds_tbl["tie"].to_numpy(zero_copy_only=False).astype(np.int64)
    b_val = bounds_tbl["val"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((b_tie, b_us, b_bkt))
    bkt_s = b_bkt[order]
    val_s = b_val[order]
    if len(bkt_s):
        first = np.concatenate(([True], bkt_s[1:] != bkt_s[:-1]))
        last = np.concatenate((bkt_s[1:] != bkt_s[:-1], [True]))
    else:
        first = last = np.zeros(0, dtype=bool)
    # present buckets, ascending; each contributes its first-row value
    # (lead neighbor for the previous bucket) and last-row value (lag
    # neighbor for the next bucket)
    firsts_b = bkt_s[first]
    firsts_v = val_s[first]
    lasts_b = bkt_s[last]
    lasts_v = val_s[last]
    # neighbor map: for bucket k (present), lead boundary = first value
    # of the NEXT present bucket; lag boundary = last value of the
    # PREVIOUS present bucket
    nb: dict[int, int | None] = {}
    if kind == "lead":
        for i in range(len(lasts_b)):
            nb[int(lasts_b[i])] = (
                int(firsts_v[i + 1]) if i + 1 < len(firsts_b) else None
            )
    else:
        for i in range(len(firsts_b)):
            nb[int(firsts_b[i])] = (
                int(lasts_v[i - 1]) if i > 0 else None
            )
    bcast = ray.put(nb)

    def tag(batch: pa.Table) -> pa.Table:
        us = _order_key_us(batch, ts_col)
        return pa.table(
            {
                tiebreak_col: batch[tiebreak_col]
                .combine_chunks()
                .cast(pa.int64()),
                "ts_us": pa.array(us, pa.int64()),
                value_col: batch[value_col]
                .combine_chunks()
                .cast(pa.int64()),
                "bkt": pa.array(us // bucket_us, pa.int64()),
            }
        )

    def within(group: pa.Table) -> pa.Table:
        nbm = ray.get(bcast)
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        tie = group[tiebreak_col].to_numpy(zero_copy_only=False)
        val = group[value_col].to_numpy(zero_copy_only=False)
        bkt = group["bkt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, us, bkt))
        us, tie, val, bkt = us[order], tie[order], val[order], bkt[order]
        shifted = np.empty(len(val), dtype=object)
        # bucket run boundaries within this (coarse-partition) group
        new_run = np.concatenate(([True], bkt[1:] != bkt[:-1]))
        run_starts = np.flatnonzero(new_run)
        run_ends = np.concatenate((run_starts[1:], [len(val)]))
        for s, e in zip(run_starts, run_ends):
            if kind == "lead":
                shifted[s : e - 1] = val[s + 1 : e]
                shifted[e - 1] = nbm.get(int(bkt[s]))
            else:
                shifted[s + 1 : e] = val[s : e - 1]
                shifted[s] = nbm.get(int(bkt[s]))
        return pa.table(
            {
                tiebreak_col: pa.array(tie, pa.int64()),
                "ts_us": pa.array(us, pa.int64()),
                value_col: pa.array(val, pa.int64()),
                out: pa.array(list(shifted), pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(
            lambda g: within(g), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------- pagerank

PR_SCALE = 1_000_000_000_000  # int64 micro-rank units
PR_DRIVER_MAX_EDGES = 200_000


def _pr_driver(
    src: np.ndarray,
    dst: np.ndarray,
    iters: int,
    scale: int,
    seeds: np.ndarray | None = None,
) -> pa.Table:
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    if seeds is None:
        base = np.full(n, (15 * scale) // (100 * n), dtype=np.int64)
        rank = np.full(n, scale // n, dtype=np.int64)
    else:
        # personalized: teleport mass restarts ONLY at the seed set
        is_seed = np.isin(nodes, seeds)
        n_s = max(int(is_seed.sum()), 1)
        base = np.where(is_seed, (15 * scale) // (100 * n_s), 0).astype(
            np.int64
        )
        rank = np.where(is_seed, scale // n_s, 0).astype(np.int64)
    for _ in range(iters):
        contrib = (85 * rank[si]) // (100 * outdeg[si])
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, di, contrib)
        rank = base + acc
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "pr_rank": pa.array(rank, pa.int64()),
        }
    )


def pagerank(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = PR_SCALE,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
    seeds: "np.ndarray | None" = None,
) -> "ray.data.Dataset":
    """Fixed-point integer PageRank (damping 0.85) over a distinct
    directed edge Dataset.  Returns ``(node, pr_rank)`` int64 rows, one
    per node appearing in any edge.  Bit-reproducible at any partition
    count: ranks are int64 and every contribution is an exact floor
    division, so summation order cannot change the result.
    """
    if driver_max_edges is None:
        driver_max_edges = PR_DRIVER_MAX_EDGES
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "pr_rank": pa.array([], pa.int64()),
                }
            )
        )
    if n_edges <= driver_max_edges:
        tbl = pa.concat_tables(
            ray.get(edges.to_arrow_refs()), promote_options="default"
        )
        return ray.data.from_arrow(
            _pr_driver(
                tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
                iters,
                scale,
                seeds=seeds,
            )
        )

    # ---- distributed path: static (src, dst, outdeg) x iterated ranks
    def to_sd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch[src_col].combine_chunks().cast(pa.int64()),
                "dst": batch[dst_col].combine_chunks().cast(pa.int64()),
            }
        )

    e = edges.map_batches(to_sd, batch_format="pyarrow")

    def node_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        return pa.table({"node": pa.array(u, pa.int64())})

    def node_merge(g: pa.Table) -> pa.Table:
        u = np.unique(g["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes_ds = _coarse_group_apply(
        e.map_batches(node_partial, batch_format="pyarrow"),
        "node",
        node_merge,
        num_parts,
    ).materialize()
    n = nodes_ds.count()
    if seeds is None:
        seeds_sorted = None
        base = (15 * scale) // (100 * n)
        init = scale // n
    else:
        # personalized: count seed nodes PRESENT in the graph, then
        # teleport/init only at those (membership probed per batch via
        # a broadcast sorted array)
        seeds_sorted = np.sort(np.unique(np.asarray(seeds, np.int64)))
        sref = ray.put(seeds_sorted)

        def count_present(batch: pa.Table) -> pa.Table:
            ss = ray.get(sref)
            u = batch["node"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ss, u), 0, len(ss) - 1)
            return pa.table(
                {"c": pa.array([int((ss[pos] == u).sum())], pa.int64())}
            )

        n_s = max(
            int(
                nodes_ds.map_batches(
                    count_present, batch_format="pyarrow"
                ).sum("c")
            ),
            1,
        )
        base = (15 * scale) // (100 * n_s)
        init = scale // n_s

    def deg_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch["src"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "node": pa.array(u.astype(np.int64), pa.int64()),
                "deg": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def deg_merge(g: pa.Table) -> pa.Table:
        t = g.group_by("node").aggregate([("deg", "sum")])
        return pa.table(
            {
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "deg": t["deg_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    deg_ds = _coarse_group_apply(
        e.map_batches(deg_partial, batch_format="pyarrow"),
        "node",
        deg_merge,
        num_parts,
    )
    # static per-edge outdeg table — joined once, reused every iteration
    e_deg = hash_join(
        e, deg_ds, left_key="src", right_key="node", num_parts=num_parts
    ).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        if seeds_sorted is None:
            r = np.full(batch.num_rows, init, dtype=np.int64)
        else:
            ss = ray.get(sref)
            u = batch["node"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ss, u), 0, len(ss) - 1)
            r = np.where(ss[pos] == u, init, 0).astype(np.int64)
        return pa.table(
            {
                "node": batch["node"],
                "pr_rank": pa.array(r, pa.int64()),
            }
        )

    ranks = nodes_ds.map_batches(init_rank, batch_format="pyarrow")
    zero_rows = nodes_ds.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "c": pa.array(
                    np.zeros(b.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def sum_by_node(g: pa.Table) -> pa.Table:
        t = g.group_by("node").aggregate([("c", "sum")])
        return pa.table(
            {
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "c": t["c_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    for _ in range(iters):
        joined = hash_join(
            e_deg,
            ranks,
            left_key="src",
            right_key="node",
            num_parts=num_parts,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch["pr_rank"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            d = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "node": batch["dst"].combine_chunks().cast(pa.int64()),
                    "c": pa.array((85 * r) // (100 * d), pa.int64()),
                }
            )

        msgs = joined.map_batches(contrib, batch_format="pyarrow")
        summed = _coarse_group_apply(
            zero_rows.union(msgs), "node", sum_by_node, num_parts
        )
        def add_base(b: pa.Table) -> pa.Table:
            c = b["c"].combine_chunks().cast(pa.int64())
            if seeds_sorted is None:
                r = pc.add(c, pa.scalar(base, pa.int64()))
            else:
                ss = ray.get(sref)
                u = b["node"].to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(ss, u), 0, len(ss) - 1)
                bvec = np.where(ss[pos] == u, base, 0).astype(np.int64)
                r = pa.array(
                    c.to_numpy(zero_copy_only=False) + bvec, pa.int64()
                )
            return pa.table({"node": b["node"], "pr_rank": r})

        ranks = summed.map_batches(
            add_base, batch_format="pyarrow"
        ).materialize()

    return ranks


def _opic_driver(
    src: np.ndarray, dst: np.ndarray, iters: int, scale: int
) -> pa.Table:
    """Vectorized driver OPIC (Abiteboul, Preda & Cobena, WWW'03
    "Adaptive On-Line Page Importance Computation") in the
    batch-synchronous formulation: every node holds CASH, each round
    distributes it equally to its outlinks (floor division — exact
    int64, bit-reproducible like ``pagerank``), dangling nodes pay
    their cash to the paper's VIRTUAL node, whose balance redistributes
    equally to all nodes the next round; HISTORY accumulates the cash
    each node held.  Importance estimate = history + current cash."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.bincount(si, minlength=n).astype(np.int64)
    cash = np.full(n, scale // n, dtype=np.int64)
    hist = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        g = int(cash[deg == 0].sum())  # dangling pay the virtual node
        new = np.zeros(n, dtype=np.int64)
        np.add.at(new, di, cash[si] // deg[si])
        new += g // n  # virtual node redistributes to everyone
        hist += cash
        cash = new
    return pa.table(
        {
            "node": pa.array(nodes.astype(np.int64), pa.int64()),
            "opic_rank": pa.array(hist + cash, pa.int64()),
        }
    )


def opic_scores(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = PR_SCALE,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """OPIC importance over a distinct directed edge Dataset — the
    page-importance signal DESIGNED for crawl frontier prioritization
    (unlike PageRank it needs no converged global solve; the crawler
    reads a page's current history+cash when scheduling it).  Returns
    (node, opic_rank) int64 rows, one per node in any edge.

    Distributed shape mirrors ``pagerank``: a static (src, dst,
    outdeg) edge table joins the iterated state once per round; the
    state carries (cash, hist, dangling) and the virtual-node balance
    is the one driver-bound scalar per round (an exact int sum).  All
    arithmetic is int64 floor division, so any partition count
    reproduces the driver kernel bit for bit."""
    if driver_max_edges is None:
        driver_max_edges = PR_DRIVER_MAX_EDGES
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "opic_rank": pa.array([], pa.int64()),
                }
            )
        )
    if n_edges <= driver_max_edges:
        tbl = pa.concat_tables(
            ray.get(edges.to_arrow_refs()), promote_options="default"
        )
        return ray.data.from_arrow(
            _opic_driver(
                tbl[src_col].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                tbl[dst_col].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                iters,
                scale,
            )
        )

    # ---- distributed path
    def to_sd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch[src_col].combine_chunks().cast(pa.int64()),
                "dst": batch[dst_col].combine_chunks().cast(pa.int64()),
            }
        )

    e = edges.map_batches(to_sd, batch_format="pyarrow")

    def node_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        return pa.table({"node": pa.array(u, pa.int64())})

    def node_merge(g: pa.Table) -> pa.Table:
        u = np.unique(g["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes_ds = _coarse_group_apply(
        e.map_batches(node_partial, batch_format="pyarrow"),
        "node",
        node_merge,
        num_parts,
    ).materialize()
    n = nodes_ds.count()

    def deg_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch["src"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "node": pa.array(u.astype(np.int64), pa.int64()),
                "deg": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def deg_merge(g: pa.Table) -> pa.Table:
        t = g.group_by("node").aggregate([("deg", "sum")])
        return pa.table(
            {
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "deg": t["deg_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    deg_ds = _coarse_group_apply(
        e.map_batches(deg_partial, batch_format="pyarrow"),
        "node",
        deg_merge,
        num_parts,
    ).materialize()
    e_deg = hash_join(
        e, deg_ds, left_key="src", right_key="node", num_parts=num_parts
    ).materialize()

    # dangling flag: nodes minus deg-bearing nodes (one slim join)
    def dang_mark(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        have = set(df.loc[df["deg"].notna(), "node"])
        out = df[df["is_node"] == 1][["node"]].copy()
        out["dangling"] = [
            0 if v in have else 1 for v in out["node"]
        ]
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [("node", pa.int64()), ("dangling", pa.int64())]
            )
        )

    nd = nodes_ds.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "deg": pa.nulls(b.num_rows, type=pa.int64()),
                "is_node": pa.array([1] * b.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    dg = deg_ds.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "deg": b["deg"],
                "is_node": pa.array([0] * b.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    dang_ds = _coarse_group_apply(
        nd.union(dg), "node", dang_mark, num_parts
    )

    init_cash = scale // n

    def init_state(batch: pa.Table) -> pa.Table:
        nrow = batch.num_rows
        return pa.table(
            {
                "node": batch["node"],
                "cash": pa.array(
                    np.full(nrow, init_cash, dtype=np.int64), pa.int64()
                ),
                "hist": pa.array(
                    np.zeros(nrow, dtype=np.int64), pa.int64()
                ),
                "dangling": batch["dangling"],
            }
        )

    state = dang_ds.map_batches(
        init_state, batch_format="pyarrow"
    ).materialize()

    def sum_state(g: pa.Table) -> pa.Table:
        t = g.group_by("node").aggregate(
            [("c", "sum"), ("hcarry", "sum"), ("dang", "sum")]
        )
        return pa.table(
            {
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "c": t["c_sum"].combine_chunks().cast(pa.int64()),
                "hcarry": t["hcarry_sum"]
                .combine_chunks()
                .cast(pa.int64()),
                "dang": t["dang_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    def dang_cash_partial(b: pa.Table) -> pa.Table:
        s = pc.sum(pc.multiply(b["cash"], b["dangling"])).as_py()
        return pa.table({"s": pa.array([int(s or 0)], pa.int64())})

    for _ in range(iters):
        g_prev = state.map_batches(
            dang_cash_partial, batch_format="pyarrow"
        ).sum("s")
        g_share = (int(g_prev) if g_prev is not None else 0) // n

        carry = state.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "c": pa.array(
                        np.zeros(b.num_rows, dtype=np.int64), pa.int64()
                    ),
                    "hcarry": pc.add(b["hist"], b["cash"]).cast(
                        pa.int64()
                    ),
                    "dang": b["dangling"],
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            e_deg,
            state,
            left_key="src",
            right_key="node",
            num_parts=num_parts,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            c = batch["cash"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            d = batch["deg"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            nrow = batch.num_rows
            return pa.table(
                {
                    "node": batch["dst"]
                    .combine_chunks()
                    .cast(pa.int64()),
                    "c": pa.array(c // d, pa.int64()),
                    "hcarry": pa.array(
                        np.zeros(nrow, dtype=np.int64), pa.int64()
                    ),
                    "dang": pa.array(
                        np.zeros(nrow, dtype=np.int64), pa.int64()
                    ),
                }
            )

        msgs = joined.map_batches(contrib, batch_format="pyarrow")
        summed = _coarse_group_apply(
            carry.union(msgs), "node", sum_state, num_parts
        )

        def next_state(b: pa.Table, _g=g_share) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"],
                    "cash": pc.add(
                        b["c"], pa.scalar(_g, pa.int64())
                    ).cast(pa.int64()),
                    "hist": b["hcarry"],
                    "dangling": b["dang"],
                }
            )

        state = summed.map_batches(
            next_state, batch_format="pyarrow"
        ).materialize()

    return state.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "opic_rank": pc.add(b["hist"], b["cash"]).cast(
                    pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _salsa_driver(
    src: np.ndarray, dst: np.ndarray, iters: int, scale: int
) -> pa.Table:
    """Vectorized driver SALSA: degree-normalized HITS (Lempel & Moran
    2001).  Dividing each pull by the pulled node's degree keeps every
    score bounded by the initial total mass, so int64 floor divisions
    never overflow and no per-iteration normalization step is needed —
    the same trick that makes ``pagerank`` bit-reproducible."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    indeg = np.bincount(di, minlength=n).astype(np.int64)
    hub = np.full(n, scale // n, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        # authority pull: a(v) = sum_{u->v} h(u) // outdeg(u)
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, di, hub[si] // outdeg[si])
        auth = acc
        # hub pull: h(u) = sum_{u->v} a(v) // indeg(v)
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, si, auth[di] // indeg[di])
        hub = acc
    return pa.table(
        {
            "node": pa.array(nodes.astype(np.int64), pa.int64()),
            "hub_rank": pa.array(hub, pa.int64()),
            "auth_rank": pa.array(auth, pa.int64()),
        }
    )


def salsa_scores(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = PR_SCALE,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """SALSA hub/authority scores (Lempel & Moran 2001 — the
    degree-normalized HITS variant TREC/web search uses) over a
    distinct directed edge Dataset.  Returns ``(node, hub_rank,
    auth_rank)`` int64 rows, one per node appearing in any edge.

    Where PageRank ranks the crawl frontier by global visit mass, SALSA
    separates DIRECTORY pages (hubs: pages whose outlinks point at
    in-demand targets) from CONTENT pages (authorities: pages pulled in
    by well-spread hubs) — the signal a crawler uses to fetch hub pages
    more often than leaf articles (the reference's hub-page-first round
    structure, ``collect_data.py``, hard-codes exactly this prior).

    Bit-reproducible at any partition count: scores are int64 and every
    pull is an exact floor division (``h // outdeg`` then ``a //
    indeg``), so summation order cannot change the result and an
    unrolled-CTE SQL twin hash-matches exactly.

    Threshold-switched like ``pagerank``: below ``driver_max_edges``
    the int64 edge pairs (never payloads) come to the driver for a
    vectorized bincount loop; above, the static (edge, outdeg, indeg)
    table is built ONCE (two co-partition joins) and each iteration is
    two hash joins + coarse sum-reduces, only int64 rows in flight.
    """
    if driver_max_edges is None:
        driver_max_edges = PR_DRIVER_MAX_EDGES
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "hub_rank": pa.array([], pa.int64()),
                    "auth_rank": pa.array([], pa.int64()),
                }
            )
        )
    if n_edges <= driver_max_edges:
        tbl = pa.concat_tables(
            ray.get(edges.to_arrow_refs()), promote_options="default"
        )
        return ray.data.from_arrow(
            _salsa_driver(
                tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
                tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
                iters,
                scale,
            )
        )

    # ---- distributed path: static (src, dst, odeg, ideg) x iterated
    def to_sd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch[src_col].combine_chunks().cast(pa.int64()),
                "dst": batch[dst_col].combine_chunks().cast(pa.int64()),
            }
        )

    e = edges.map_batches(to_sd, batch_format="pyarrow")

    def _deg_partial(col: str):
        def partial(batch: pa.Table) -> pa.Table:
            u, c = np.unique(
                batch[col].to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "node": pa.array(u.astype(np.int64), pa.int64()),
                    "deg": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        return partial

    def _deg_merge(g: pa.Table) -> pa.Table:
        t = g.group_by("node").aggregate([("deg", "sum")])
        return pa.table(
            {
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "deg": t["deg_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    odeg_ds = _coarse_group_apply(
        e.map_batches(_deg_partial("src"), batch_format="pyarrow"),
        "node",
        _deg_merge,
        num_parts,
    )
    ideg_ds = _coarse_group_apply(
        e.map_batches(_deg_partial("dst"), batch_format="pyarrow"),
        "node",
        _deg_merge,
        num_parts,
    )
    e_od = hash_join(
        e, odeg_ds, left_key="src", right_key="node", num_parts=num_parts
    ).map_batches(
        lambda b: pa.table(
            {"src": b["src"], "dst": b["dst"], "odeg": b["deg"]}
        ),
        batch_format="pyarrow",
    )
    e_deg = hash_join(
        e_od, ideg_ds, left_key="dst", right_key="node",
        num_parts=num_parts,
    ).map_batches(
        lambda b: pa.table(
            {
                "src": b["src"],
                "dst": b["dst"],
                "odeg": b["odeg"],
                "ideg": b["deg"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def node_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        return pa.table({"node": pa.array(u, pa.int64())})

    def node_merge(g: pa.Table) -> pa.Table:
        u = np.unique(g["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes_ds = _coarse_group_apply(
        e.map_batches(node_partial, batch_format="pyarrow"),
        "node",
        node_merge,
        num_parts,
    ).materialize()
    n = nodes_ds.count()
    init = scale // n
    zero_rows = nodes_ds.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "c": pa.array(
                    np.zeros(b.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def sum_by_node(g: pa.Table) -> pa.Table:
        t = g.group_by("node").aggregate([("c", "sum")])
        return pa.table(
            {
                "node": t["node"].combine_chunks().cast(pa.int64()),
                "c": t["c_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    def _pull(score_ds, join_key, emit_key, deg_col):
        # one half-iteration: join scores onto the static edge table at
        # ``join_key``, emit score // deg at ``emit_key``, sum per node
        joined = hash_join(
            e_deg, score_ds, left_key=join_key, right_key="node",
            num_parts=num_parts,
        )

        def msg(batch: pa.Table) -> pa.Table:
            s = batch["score"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            d = batch[deg_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "node": batch[emit_key].combine_chunks().cast(
                        pa.int64()
                    ),
                    "c": pa.array(s // d, pa.int64()),
                }
            )

        summed = _coarse_group_apply(
            zero_rows.union(
                joined.map_batches(msg, batch_format="pyarrow")
            ),
            "node",
            sum_by_node,
            num_parts,
        )
        return summed.map_batches(
            lambda b: pa.table({"node": b["node"], "score": b["c"]}),
            batch_format="pyarrow",
        ).materialize()

    hub = nodes_ds.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "score": pa.array(
                    np.full(b.num_rows, init, dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    auth = None
    for _ in range(iters):
        auth = _pull(hub, "src", "dst", "odeg")
        hub = _pull(auth, "dst", "src", "ideg")

    merged = hash_join(
        hub.map_batches(
            lambda b: pa.table({"node": b["node"], "hub_rank": b["score"]}),
            batch_format="pyarrow",
        ),
        auth.map_batches(
            lambda b: pa.table(
                {"node_a": b["node"], "auth_rank": b["score"]}
            ),
            batch_format="pyarrow",
        ),
        left_key="node",
        right_key="node_a",
        num_parts=num_parts,
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "hub_rank": b["hub_rank"],
                "auth_rank": b["auth_rank"],
            }
        ),
        batch_format="pyarrow",
    )


def trailing_window_sum(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    cents_col: str = "cents",
    id_col: str = "event_id",
    window_us: int = 3_600_000_000,
    num_parts: int = 32,
    out_col: str = "trail_cents",
) -> "ray.data.Dataset":
    """Sliding event-time window: per key, the sum of ``cents_col``
    over rows whose timestamp lies in ``[ts - window, ts]`` — SQL
    ``RANGE BETWEEN <window> PRECEDING AND CURRENT ROW`` semantics
    (equal-timestamp rows are peers: they all see the full peer group).

    Coarse-partitioned on the key (the tumbling-window shape), then a
    vectorized per-key two-pointer: prefix sums + two ``searchsorted``
    calls per key segment.  The shuffle carries (id, key, ts, cents)
    int64 rows only; within a partition everything is numpy.
    """

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col].combine_chunks().cast(pa.int64()),
                "ts_us": pa.array(
                    _order_key_us(batch, ts_col), pa.int64()
                ),
                cents_col: batch[cents_col]
                .combine_chunks()
                .cast(pa.int64()),
            }
        )

    def windowed(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        cents = group[cents_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us, keys))
        ids, keys, us, cents = (
            ids[order],
            keys[order],
            us[order],
            cents[order],
        )
        out = np.zeros(len(ids), dtype=np.int64)
        seg_starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        seg_ends = np.concatenate((seg_starts[1:], [len(ids)]))
        for s, e in zip(seg_starts, seg_ends):
            t = us[s:e]
            csum = np.concatenate(([0], np.cumsum(cents[s:e])))
            lo = np.searchsorted(t, t - window_us, side="left")
            hi = np.searchsorted(t, t, side="right")
            out[s:e] = csum[hi] - csum[lo]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                out_col: pa.array(out, pa.int64()),
            }
        )

    from .dedup import _coarse_group_apply

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        key_col,
        windowed,
        num_parts,
    )


def ntile(
    ds: "ray.data.Dataset",
    n_tiles: int = 4,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_parts: int = 32,
    out_col: str = "tile",
) -> "ray.data.Dataset":
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY ts, id)``: rows
    of each key split into ``n_tiles`` contiguous groups, the first
    ``n mod n_tiles`` groups one row larger (the standard remainder
    rule).

    Same coarse key partition as ``trailing_window_sum``; within a
    partition the tile index is pure arithmetic on the per-key row
    index (vectorized — no per-row Python), and the shuffle carries
    (id, key, ts) int64 rows only.
    """

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col].combine_chunks().cast(pa.int64()),
                "ts_us": pa.array(
                    _order_key_us(batch, ts_col), pa.int64()
                ),
            }
        )

    def tiles(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us, keys))
        ids, keys, us = ids[order], keys[order], us[order]
        seg_starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        seg_lens = np.diff(np.concatenate((seg_starts, [len(ids)])))
        # per-row index within its key segment, vectorized
        idx = np.arange(len(ids), dtype=np.int64) - np.repeat(
            seg_starts, seg_lens
        )
        n = np.repeat(seg_lens, seg_lens).astype(np.int64)
        big = n % n_tiles                   # tiles that get an extra row
        size_lo = n // n_tiles              # base tile size (may be 0)
        size_hi = size_lo + 1
        cut = big * size_hi                 # rows covered by the big tiles
        in_big = idx < cut
        # size_lo can be 0 only when every row is in a big tile
        safe_lo = np.maximum(size_lo, 1)
        tile = np.where(
            in_big, idx // size_hi, big + (idx - cut) // safe_lo
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                out_col: pa.array(tile + 1, pa.int64()),
            }
        )

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        key_col,
        tiles,
        num_parts,
    )


def dense_rank(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    id_col: str,
    num_parts: int = 32,
    out_col: str = "rnk",
) -> "ray.data.Dataset":
    """SQL ``DENSE_RANK() OVER (PARTITION BY key ORDER BY val)`` —
    ties share a rank, no gaps.

    Coarse key-hash partition (each key wholly inside one partition),
    then fully vectorized within the partition: one lexsort, segment
    boundaries by key, rank = running count of value CHANGES inside
    the segment.  The shuffle carries (id, key, val) only.
    """
    from .dedup import _hash64

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col],
                val_col: batch[val_col],
                "_kh": pa.array(
                    [_hash64(str(k)) for k in keys], pa.uint64()
                ),
            }
        )

    def rank_part(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        kh = group["_kh"].to_numpy(zero_copy_only=False)
        vals = group[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, kh))
        ids_o, kh_o, vals_o = ids[order], kh[order], vals[order]
        new_seg = np.concatenate(([True], kh_o[1:] != kh_o[:-1]))
        new_val = np.concatenate(([True], vals_o[1:] != vals_o[:-1]))
        bump = (new_seg | new_val).astype(np.int64)
        run = np.cumsum(bump)
        # subtract the running total at each segment start so ranks
        # restart at 1 per key
        seg_starts = np.flatnonzero(new_seg)
        seg_lens = np.diff(np.concatenate((seg_starts, [len(ids_o)])))
        base = np.repeat(run[seg_starts] - 1, seg_lens)
        keys_o = group[key_col].take(
            pa.array(order, pa.int64())
        )
        return pa.table(
            {
                id_col: pa.array(ids_o, pa.int64()),
                key_col: keys_o,
                out_col: pa.array(run - base, pa.int64()),
            }
        )

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        "_kh",
        rank_part,
        num_parts,
    )


def rows_window_sum(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    cents_col: str = "cents",
    id_col: str = "event_id",
    n_preceding: int = 3,
    num_parts: int = 32,
    out_col: str = "rows_cents",
) -> "ray.data.Dataset":
    """ROWS-frame trailing sum: per key, ordered by (ts, id), the sum
    of the current row and up to ``n_preceding`` physical predecessors
    — SQL ``ROWS BETWEEN n PRECEDING AND CURRENT ROW``.  Unlike the
    RANGE frame, peers do NOT share a value, so the (ts, id) order
    must be total — id is the deterministic tiebreak.

    Same shape as ``trailing_window_sum``: coarse key partition, per
    key a prefix-sum difference at fixed lag; the shuffle carries four
    int64 columns.
    """

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col].combine_chunks().cast(pa.int64()),
                "ts_us": pa.array(
                    _order_key_us(batch, ts_col), pa.int64()
                ),
                cents_col: batch[cents_col]
                .combine_chunks()
                .cast(pa.int64()),
            }
        )

    def windowed(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        cents = group[cents_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us, keys))
        ids, keys, cents = ids[order], keys[order], cents[order]
        n = len(ids)
        seg_starts_mask = np.concatenate(
            ([True], keys[1:] != keys[:-1])
        )
        # index of each row's segment start, broadcast per run
        starts = np.flatnonzero(seg_starts_mask)
        lens = np.diff(np.concatenate((starts, [n])))
        seg_start = np.repeat(starts, lens)
        csum = np.concatenate(([0], np.cumsum(cents)))
        idx = np.arange(n)
        lo = np.maximum(seg_start, idx - n_preceding)
        out = csum[idx + 1] - csum[lo]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                out_col: pa.array(out, pa.int64()),
            }
        )

    from .dedup import _coarse_group_apply

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        key_col,
        windowed,
        num_parts,
    )


def cume_dist_counts(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    val_col: str = "cents",
    id_col: str = "event_id",
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """CUME_DIST as exact integers: per key, ``n_le`` = rows with
    value <= mine (peers included) and ``n_key`` = partition size —
    cume_dist = n_le / n_key without ever emitting a float (floats
    don't hash stably across engines; the two ints carry the same
    information exactly).

    Coarse key partition, one lexsort, value-run boundaries give every
    row its run's END position within the key segment — all numpy.
    """

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col].combine_chunks().cast(pa.int64()),
                val_col: batch[val_col].combine_chunks().cast(pa.int64()),
            }
        )

    def rank_part(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        vals = group[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        ids, keys, vals = ids[order], keys[order], vals[order]
        n = len(ids)
        new_seg = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(new_seg)
        lens = np.diff(np.concatenate((starts, [n])))
        seg_start = np.repeat(starts, lens)
        n_key = np.repeat(lens, lens)
        # a value RUN ends where the next (key, val) differs; every row
        # in the run shares the run-end position -> n_le = end - start
        run_bound = np.concatenate(
            (new_seg[1:] | (vals[1:] != vals[:-1]), [True])
        )
        bound_idx = np.flatnonzero(run_bound)  # inclusive run ends
        run_end = bound_idx[
            np.searchsorted(bound_idx, np.arange(n), side="left")
        ]
        n_le = run_end + 1 - seg_start
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_le": pa.array(n_le, pa.int64()),
                "n_key": pa.array(n_key, pa.int64()),
            }
        )

    from .dedup import _coarse_group_apply

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        key_col,
        rank_part,
        num_parts,
    )


def global_row_number(
    ds: "ray.data.Dataset",
    val_col: str = "cents",
    id_col: str = "event_id",
    bucket_width: int = 1 << 10,
    num_parts: int = 32,
    out_col: str = "rn",
) -> "ray.data.Dataset":
    """SQL ``ROW_NUMBER() OVER (ORDER BY val, id)`` — a GLOBAL rank —
    without a global sort and without the driver seeing rows.

    Two passes over (id, val) int64 rows:
    1. per-block counts per ORDERED value bucket (val // width) — a
       combiner groupby whose result (one row per bucket) comes to the
       driver, where the exclusive prefix sum gives each bucket its
       global offset (broadcast via ``ray.put``);
    2. co-partition by bucket; a bucket's rows land whole in one
       partition, so its internal (val, id) lexsort positions are
       exact; rank = bucket offset + local position.

    The shuffle carries (id, val, bucket) only; driver state is one
    int per non-empty bucket.  Pick ``bucket_width`` so value range /
    width ~ 1e4-1e6 buckets.
    """
    from .dedup import _coarse_group_apply

    def tag(batch: pa.Table) -> pa.Table:
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                val_col: pa.array(v, pa.int64()),
                # floor division keeps bucket order == value order for
                # negatives too
                "_bkt": pa.array(v // bucket_width, pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        b = batch["_bkt"].to_numpy(zero_copy_only=False)
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {
                "_bkt": pa.array(u, pa.int64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    # the per-block (bucket, count) partials land on the driver either
    # way — merge with numpy instead of paying a shuffle round first
    # (driver rows: <= buckets x blocks, same contract up to the
    # block-overlap factor)
    parts = pa.concat_tables(
        ray.get(
            tagged.map_batches(
                count_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    pb = parts["_bkt"].to_numpy(zero_copy_only=False).astype(np.int64)
    pc_ = parts["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    bkts, inv = np.unique(pb, return_inverse=True)
    if bkts.size == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.int64()),
                }
            )
        )
    c = np.zeros(len(bkts), dtype=np.int64)
    np.add.at(c, inv, pc_)
    offsets = np.concatenate(([0], np.cumsum(c)[:-1]))
    off_ref = ray.put((bkts, offsets))

    def rank_part(group: pa.Table) -> pa.Table:
        sb, so = ray.get(off_ref)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        v = group[val_col].to_numpy(zero_copy_only=False)
        b = group["_bkt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v, b))
        ids_o, b_o = ids[order], b[order]
        new_b = np.concatenate(([True], b_o[1:] != b_o[:-1]))
        starts = np.flatnonzero(new_b)
        lens = np.diff(np.concatenate((starts, [len(ids_o)])))
        local = np.arange(len(ids_o)) - np.repeat(starts, lens)
        base = so[np.searchsorted(sb, b_o)]
        return pa.table(
            {
                id_col: pa.array(ids_o, pa.int64()),
                out_col: pa.array(base + local + 1, pa.int64()),
            }
        )

    # bucket ints can be negative; offset into non-negative space for
    # the coarse partitioner's uint cast
    def shift(batch: pa.Table) -> pa.Table:
        b = batch["_bkt"].to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.column_names.index("_bkt"),
            "_bkt",
            pa.array(b - int(bkts.min()), pa.int64()),
        )

    shifted = tagged.map_batches(shift, batch_format="pyarrow")

    def rank_part_shifted(group: pa.Table) -> pa.Table:
        b = group["_bkt"].to_numpy(zero_copy_only=False) + int(bkts.min())
        g2 = group.set_column(
            group.column_names.index("_bkt"), "_bkt", pa.array(b, pa.int64())
        )
        return rank_part(g2)

    return _coarse_group_apply(
        shifted, "_bkt", rank_part_shifted, num_parts
    )


def global_ntile(
    ds: "ray.data.Dataset",
    n_total: int,
    k: int,
    val_col: str = "cents",
    id_col: str = "event_id",
    bucket_width: int = 1 << 10,
    num_parts: int = 32,
) -> "ray.data.Dataset":
    """GLOBAL equi-depth binning — SQL ``NTILE(k) OVER (ORDER BY val,
    id)`` — without a global sort: composes the sort-free
    ``global_row_number`` with the NTILE remainder rule (the first
    ``n % k`` tiles get ``n // k + 1`` rows) applied vectorized per
    batch.  ``n_total`` is the exact row count (parquet metadata or a
    prior aggregate); everything else inherits the row-number scale
    shape — one (bucket, count) combiner to the driver, one
    co-partition by ordered bucket, no global sort, no rows on the
    driver.
    """
    rn = global_row_number(
        ds,
        val_col=val_col,
        id_col=id_col,
        bucket_width=bucket_width,
        num_parts=num_parts,
        out_col="rn",
    )
    base = n_total // k
    rem = n_total % k
    big = base + 1
    cut = rem * big

    def tile(batch: pa.Table) -> pa.Table:
        r = batch["rn"].to_numpy(zero_copy_only=False)
        small = np.where(
            base > 0, rem + (r - 1 - cut) // max(base, 1) + 1, 0
        )
        t = np.where(r <= cut, (r - 1) // big + 1, small)
        return pa.table(
            {
                id_col: batch[id_col],
                "tile": pa.array(t.astype(np.int64), pa.int64()),
            }
        )

    return rn.map_batches(tile, batch_format="pyarrow")


def merge_intervals(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    start_col: str = "s_us",
    end_col: str = "e_us",
    id_col: str = "event_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Gaps-and-islands: merge overlapping/touching ``[s, e]`` intervals
    per key into islands; one output row per island with its span and
    member count.

    Unlike ``sessionize`` (point events + gap threshold) the intervals
    here have real durations, so island membership depends on the
    RUNNING MAX of prior interval ends, not just the previous row: an
    early long interval can swallow several later short ones.

    Distribution: one hash shuffle on ``key_col`` (a key's intervals
    land whole in one partition); inside the partition everything is
    vectorized pandas — ``groupby.cummax`` for the running end, a
    group-shift for the preceding-rows max, cumsum for island ids.
    Skewed keys degrade to bigger groups, never hot single-row tasks.
    Output is one row per island, so the result is strictly smaller
    than the input — safe to feed downstream aggregates.
    """
    import pandas as pd

    def islands(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        if len(df) == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "island_id": pa.array([], pa.int64()),
                    "island_start_us": pa.array([], pa.int64()),
                    "island_end_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        df = df.sort_values([key_col, start_col, id_col], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        # running max of interval ends over PRECEDING rows in the key
        prev_max = g[end_col].cummax().groupby(df[key_col]).shift(1)
        new_island = prev_max.isna() | (df[start_col] > prev_max)
        df["island_id"] = new_island.astype("int64").groupby(df[key_col]).cumsum()
        out = (
            df.groupby([key_col, "island_id"], sort=False)
            .agg(
                island_start_us=(start_col, "min"),
                island_end_us=(end_col, "max"),
                n_events=(id_col, "size"),
            )
            .reset_index()
        )
        return pa.table(
            {
                key_col: pa.array(out[key_col], pa.int64()),
                "island_id": pa.array(out["island_id"], pa.int64()),
                "island_start_us": pa.array(out["island_start_us"], pa.int64()),
                "island_end_us": pa.array(out["island_end_us"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
            }
        )

    return _coarse_group_apply(ds, key_col, islands, num_parts)


def rank_with_gaps(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    id_col: str,
    num_parts: int = 32,
    out_col: str = "rnk",
) -> "ray.data.Dataset":
    """SQL ``RANK() OVER (PARTITION BY key ORDER BY val)`` — ties share
    a rank and the next value SKIPS (gaps), unlike ``dense_rank``.

    Same partition shape as ``dense_rank`` (coarse key hash, one
    lexsort per partition); rank = the value-run's first position
    within its key segment + 1, fully vectorized from run/segment
    boundary indices.
    """
    from .dedup import _hash64

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col],
                val_col: batch[val_col],
                "_kh": pa.array(
                    [_hash64(str(k)) for k in keys], pa.uint64()
                ),
            }
        )

    def rank_part(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        kh = group["_kh"].to_numpy(zero_copy_only=False)
        vals = group[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, kh))
        ids_o, kh_o, vals_o = ids[order], kh[order], vals[order]
        n = len(ids_o)
        new_seg = np.concatenate(([True], kh_o[1:] != kh_o[:-1]))
        new_run = new_seg | np.concatenate(
            ([True], vals_o[1:] != vals_o[:-1])
        )
        run_starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.concatenate((run_starts, [n])))
        first_pos = np.repeat(run_starts, run_lens)
        seg_starts = np.flatnonzero(new_seg)
        seg_lens = np.diff(np.concatenate((seg_starts, [n])))
        seg_base = np.repeat(seg_starts, seg_lens)
        keys_o = group[key_col].take(pa.array(order, pa.int64()))
        return pa.table(
            {
                id_col: pa.array(ids_o, pa.int64()),
                key_col: keys_o,
                out_col: pa.array(first_pos - seg_base + 1, pa.int64()),
            }
        )

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        "_kh",
        rank_part,
        num_parts,
    )


def global_prefix_max(
    ds: "ray.data.Dataset",
    order_col: str = "event_id",
    val_col: str = "ts_us",
    bucket_width: int = 1 << 10,
    num_parts: int = 32,
    out_col: str = "prefix_max",
) -> "ray.data.Dataset":
    """Running max of ``val_col`` over all STRICTLY-EARLIER rows in the
    global ``order_col`` order (first row per order -> INT64_MIN), with
    no global sort — the watermark primitive for event-time streaming
    semantics expressed as a dataflow.

    Same ordered-bucket shape as ``global_row_number``: per-bucket max
    partials (a combiner) -> driver exclusive prefix max over the tiny
    bucket table -> broadcast -> within-bucket vectorized running max
    seeded by the bucket's prefix.  Driver state is one int per
    non-empty bucket.
    """
    INT64_MIN = np.int64(np.iinfo(np.int64).min)

    def tag(batch: pa.Table) -> pa.Table:
        o = batch[order_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                order_col: pa.array(o, pa.int64()),
                val_col: batch[val_col].combine_chunks().cast(pa.int64()),
                "_bkt": pa.array(o // bucket_width, pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def max_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        g = df.groupby("_bkt", as_index=False)[val_col].max()
        return pa.Table.from_pandas(
            g.rename(columns={val_col: "mx"}), preserve_index=False
        )

    # per-block (bucket, max) partials are driver-bound — merge with
    # numpy instead of a shuffle round (<= buckets x blocks rows)
    bx_parts = pa.concat_tables(
        ray.get(
            tagged.map_batches(
                max_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    pb = bx_parts["_bkt"].to_numpy(zero_copy_only=False).astype(np.int64)
    pm = bx_parts["mx"].to_numpy(zero_copy_only=False).astype(np.int64)
    bkts, inv = np.unique(pb, return_inverse=True)
    mx = np.full(len(bkts), INT64_MIN, dtype=np.int64)
    np.maximum.at(mx, inv, pm)
    # exclusive prefix max: bucket k sees the max of buckets < k
    excl = np.concatenate(
        ([INT64_MIN], np.maximum.accumulate(mx)[:-1])
    ).astype(np.int64)
    pre_ref = ray.put((bkts, excl))

    from .dedup import _coarse_group_apply

    def within(group: pa.Table) -> pa.Table:
        sb, se = ray.get(pre_ref)
        df = group.to_pandas().sort_values(["_bkt", order_col])
        v = df[val_col].to_numpy(dtype=np.int64)
        b = df["_bkt"].to_numpy(dtype=np.int64)
        new_b = np.concatenate(([True], b[1:] != b[:-1]))
        starts = np.flatnonzero(new_b)
        # running max over STRICTLY-PRECEDING rows = cummax of the
        # right-shifted values, re-seeded at each bucket start with the
        # bucket's exclusive global prefix.  A plain cummax would leak
        # an earlier in-partition bucket's values into a later segment,
        # but each seed already equals the max over ALL earlier buckets
        # (globally), so any leaked value is <= the seed and the single
        # accumulate is exact.
        prev = np.concatenate(([INT64_MIN], v[:-1]))
        seed = se[np.clip(np.searchsorted(sb, b), 0, len(sb) - 1)]
        prev[starts] = seed[starts]
        out = np.maximum.accumulate(prev)
        return pa.table(
            {
                order_col: pa.array(
                    df[order_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                out_col: pa.array(out, pa.int64()),
            }
        )

    return _coarse_group_apply(tagged, "_bkt", within, num_parts)


def max_concurrency(
    ds: "ray.data.Dataset",
    s_col: str = "s_us",
    e_col: str = "e_us",
    bucket_width: int = 1 << 40,
    num_parts: int = 32,
) -> pa.Table:
    """Sweep-line maximum concurrency over [s, e) intervals with NO
    global sort: each interval emits (+1 at s, -1 at e) endpoint rows
    tagged with an ORDERED time bucket; one coarse shuffle co-locates
    each bucket, whose exact internal running sum (ties: -1 before +1,
    so touching intervals never overlap) reduces to ONE (bucket,
    sum_delta, max_running) row; the driver's exclusive prefix sum
    over the tiny bucket table yields the global maximum — the
    segmented-scan shape shared with ``global_row_number`` /
    ``global_prefix_max``.  Returns one row:
    (max_concurrent, n_intervals)."""
    from .dedup import _coarse_group_apply

    def endpoints(batch: pa.Table) -> pa.Table:
        s = batch[s_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        e = batch[e_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = np.concatenate([s, e])
        d = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        return pa.table(
            {
                "t": pa.array(t, pa.int64()),
                "d": pa.array(d, pa.int64()),
                "_bkt": pa.array(t // bucket_width, pa.int64()),
            }
        )

    pts = ds.map_batches(endpoints, batch_format="pyarrow")

    def bucket_scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "_bkt": pa.array([], pa.int64()),
                    "sum_d": pa.array([], pa.int64()),
                    "max_run": pa.array([], pa.int64()),
                    "n_start": pa.array([], pa.int64()),
                }
            )
        b = group["_bkt"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t, b))  # within bucket: by t, then -1<+1
        b, d = b[order], d[order]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        cs = np.cumsum(d)
        # per-bucket running sum: global cumsum minus the cumsum just
        # before each bucket's first row, broadcast via repeat
        prev = np.concatenate([[0], cs[starts[1:] - 1]])
        counts = np.diff(np.r_[starts, len(d)])
        run = cs - np.repeat(prev, counts)
        return pa.table(
            {
                "_bkt": pa.array(b[starts], pa.int64()),
                "sum_d": pa.array(
                    np.add.reduceat(d, starts).astype(np.int64), pa.int64()
                ),
                "max_run": pa.array(
                    np.maximum.reduceat(run, starts).astype(np.int64),
                    pa.int64(),
                ),
                "n_start": pa.array(
                    np.add.reduceat((d > 0).astype(np.int64), starts),
                    pa.int64(),
                ),
            }
        )

    per_bucket = _coarse_group_apply(
        pts, "_bkt", bucket_scan, num_parts
    ).to_pandas()
    per_bucket = per_bucket.sort_values("_bkt")
    sums = per_bucket["sum_d"].to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]])
    gmax = int(
        (offs + per_bucket["max_run"].to_numpy(dtype=np.int64)).max()
    )
    return pa.table(
        {
            "max_concurrent": pa.array([gmax], pa.int64()),
            "n_intervals": pa.array(
                [int(per_bucket["n_start"].sum())], pa.int64()
            ),
        }
    )


def _seg_start_index(keys: np.ndarray) -> np.ndarray:
    """For a key-sorted array, each row's segment-start index."""
    n = len(keys)
    seg_starts_mask = np.concatenate(([True], keys[1:] != keys[:-1]))
    starts = np.flatnonzero(seg_starts_mask)
    lens = np.diff(np.concatenate((starts, [n])))
    return np.repeat(starts, lens)


def rows_window_median(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    cents_col: str = "cents",
    id_col: str = "event_id",
    n_preceding: int = 6,
    num_parts: int = 32,
    out_col: str = "median_cents",
) -> "ray.data.Dataset":
    """Trailing ROWS-frame MEDIAN per key, ordered by (ts, id) — SQL
    ``median(x) OVER (... ROWS BETWEEN n PRECEDING AND CURRENT ROW)``.

    Order statistics don't difference like sums, so the frame is
    materialized as an (n, W) strided matrix (W = n_preceding + 1 is a
    small constant) with NaN masking at segment starts; one
    ``np.nanmedian`` per partition replaces a per-row loop.  The
    shuffle carries four int64 columns; W never leaves the task.
    """
    W = n_preceding + 1

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col].combine_chunks().cast(pa.int64()),
                "ts_us": pa.array(_order_key_us(batch, ts_col), pa.int64()),
                cents_col: batch[cents_col].combine_chunks().cast(pa.int64()),
            }
        )

    def windowed(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        cents = group[cents_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us, keys))
        ids, keys, cents = ids[order], keys[order], cents[order]
        n = len(ids)
        seg_start = _seg_start_index(keys)
        vals = cents.astype(np.float64)
        idx = np.arange(n)
        mat = np.full((n, W), np.nan)
        for j in range(W):
            src = idx - j
            ok = src >= seg_start
            mat[ok, j] = vals[src[ok]]
        med = np.nanmedian(mat, axis=1) if n else np.empty(0)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                out_col: pa.array(med, pa.float64()),
            }
        )

    from .dedup import _coarse_group_apply

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        key_col,
        windowed,
        num_parts,
    )


def decayed_window_sum(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    cents_col: str = "cents",
    id_col: str = "event_id",
    n_terms: int = 16,
    num_parts: int = 32,
    out_col: str = "decayed_cents",
) -> "ray.data.Dataset":
    """Exact-integer exponentially decayed trailing sum (the EWMA
    numerator): per key, ordered by (ts, id),

        out[i] = sum_{j=0..n_terms-1} cents[i-j] * 2^(n_terms-1-j)

    truncated at the segment start.  Base-2 weights keep the result an
    exact int64 (cents << 15 for 16 terms stays far below 2^63), so the
    operator is oracle-checkable bit-for-bit, unlike a float EWMA.
    Computed as n_terms shifted vector adds — no per-row loop; the
    recurrence out[i] = (out[i-1] >> 1) + cents[i] << (n_terms - 1)
    would serialize, the shifted adds do not.
    """

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                key_col: batch[key_col].combine_chunks().cast(pa.int64()),
                "ts_us": pa.array(_order_key_us(batch, ts_col), pa.int64()),
                cents_col: batch[cents_col].combine_chunks().cast(pa.int64()),
            }
        )

    def windowed(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        keys = group[key_col].to_numpy(zero_copy_only=False)
        us = group["ts_us"].to_numpy(zero_copy_only=False)
        cents = group[cents_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, us, keys))
        ids, keys, cents = ids[order], keys[order], cents[order]
        n = len(ids)
        seg_start = _seg_start_index(keys)
        idx = np.arange(n)
        out = np.zeros(n, dtype=np.int64)
        for j in range(n_terms):
            src = idx - j
            ok = src >= seg_start
            out[ok] += cents[src[ok]] << (n_terms - 1 - j)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                out_col: pa.array(out, pa.int64()),
            }
        )

    from .dedup import _coarse_group_apply

    return _coarse_group_apply(
        ds.map_batches(tag, batch_format="pyarrow"),
        key_col,
        windowed,
        num_parts,
    )
