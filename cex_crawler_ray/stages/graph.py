"""Duplicate-graph operators: connected components + cluster dedup.

The reference engine stops at pairwise dedup (its seen-URL set,
reference ``exchange/base_scraper.py`` url bookkeeping); a training-data
curation pipeline additionally needs the standard next step — turn
verified near-duplicate PAIRS (``stages/dedup.py``) into duplicate
CLUSTERS and keep one representative document per cluster.

Both operators are expressed Ray-Data-first:

* ``connected_components`` — min-label propagation (hash-to-min).  Per
  iteration: one co-partition shuffle join (static edge table x current
  labels, keyed on the edge source) and one coarse-partition vectorized
  min.  The label table holds ONE row per node that appears in any pair
  (<< corpus size), so the per-iteration ``materialize()`` is bounded by
  the duplicate set, never the corpus.  Convergence is detected with an
  O(1) driver aggregate over the monotone-decreasing label sum.
  Iteration count is the graph diameter; duplicate clusters are
  near-cliques, so 2-4 rounds in practice.
* ``dedup_keep_best`` — left-join the corpus to its cluster table
  (co-partition shuffle join), give unclustered docs their own
  singleton cluster, then a coarse-partition vectorized arg-max
  (longest text wins, ties to the smallest doc_id) picks one survivor
  per cluster.  The document text never enters the shuffle — only
  (doc_id, n_chars) rows move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .dedup import _coarse_group_apply
from .join import hash_join


def _min_by_node(tbl: pa.Table) -> pa.Table:
    g = tbl.group_by("node").aggregate([("lbl", "min")])
    return pa.table(
        {
            "node": g["node"].combine_chunks().cast(pa.int64()),
            "lbl": g["lbl_min"].combine_chunks().cast(pa.int64()),
        }
    )


# below this many pairs the component computation runs as a driver
# union-find (pair rows are two int64s — 200k pairs ~ 3 MB); above it
# the distributed min-label loop runs.  Same threshold-switch pattern
# as CrawlConfig.driver_schedule_max_rows and VERIFY_BROADCAST_MAX_PAIRS.
CC_DRIVER_MAX_PAIRS = 200_000


def _cc_driver(pairs_tbl: pa.Table, id_a: str, id_b: str) -> pa.Table:
    """Union-find over a small pair table (path-halving, vectorized
    relabel at the end)."""
    a = pairs_tbl[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs_tbl[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ia, ib = inv[: len(a)], inv[len(a):]
    for x, y in zip(ia.tolist(), ib.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # min node id wins so cluster_id == min reachable id
            lo, hi = (rx, ry) if nodes[rx] < nodes[ry] else (ry, rx)
            parent[hi] = lo
    roots = np.array([find(i) for i in range(len(nodes))])
    return pa.table(
        {
            "node": nodes,
            "cluster_id": nodes[roots],
        }
    )


def connected_components(
    pairs: "ray.data.Dataset",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 50,
    num_parts: int = 64,
    driver_max_pairs: int | None = None,
) -> "ray.data.Dataset":
    """Label every node of the undirected pair graph with the smallest
    node id reachable from it (its connected component's canonical id).

    Returns a Dataset with columns ``(node, cluster_id)`` — one row per
    distinct node appearing in ``pairs``.

    Below ``driver_max_pairs`` (default ``CC_DRIVER_MAX_PAIRS``) the
    pairs — two int64s per row, never the documents — are pulled to the
    driver and solved with union-find; above it the distributed
    min-label loop runs (pass ``driver_max_pairs=0`` to force it).
    """
    if driver_max_pairs is None:
        driver_max_pairs = CC_DRIVER_MAX_PAIRS
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )
    if pairs.count() <= driver_max_pairs:
        tbl = pa.concat_tables(
            ray.get(pairs.to_arrow_refs()), promote_options="default"
        )
        return ray.data.from_arrow(_cc_driver(tbl, id_a, id_b))

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["src"],
                "lbl": pc.min_element_wise(batch["src"], batch["dst"]),
            }
        )

    labels = _coarse_group_apply(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        "node",
        _min_by_node,
        num_parts,
    ).materialize()
    if labels.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )
    prev = int(labels.sum("lbl"))

    for _ in range(max_iters):
        joined = hash_join(
            edges, labels, left_key="src", right_key="node",
            num_parts=num_parts,
        )

        def msg(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch["dst"], "lbl": batch["lbl"]})

        msgs = joined.map_batches(msg, batch_format="pyarrow")
        labels = _coarse_group_apply(
            labels.union(msgs), "node", _min_by_node, num_parts
        ).materialize()
        cur = int(labels.sum("lbl"))
        if cur == prev:
            break
        prev = cur

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch["node"], "cluster_id": batch["lbl"]}
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def _best_per_cluster(tbl: pa.Table) -> pa.Table:
    ck = tbl["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc = tbl["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    did = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((did, -nc, ck))
    ck_s, did_s = ck[order], did[order]
    first = np.ones(len(ck_s), dtype=bool)
    first[1:] = ck_s[1:] != ck_s[:-1]
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, len(ck_s)))
    return pa.table(
        {
            "doc_id": did_s[starts],
            "cluster_size": sizes.astype(np.int64),
        }
    )


def dedup_keep_best(
    corpus: "ray.data.Dataset",
    clusters: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """One surviving document per duplicate cluster: the longest text
    wins, ties broken by the smallest id.  Documents in no cluster
    survive unconditionally (singleton clusters).

    Returns ``(doc_id, cluster_size)`` — cluster_size is 1 for
    unclustered docs.
    """

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
                "n_chars": pc.cast(
                    pc.utf8_length(batch[text_col]), pa.int64()
                ),
            }
        )

    slim = corpus.map_batches(project, batch_format="pyarrow")
    joined = hash_join(
        slim, clusters, left_key="doc_id", right_key="node",
        num_parts=num_parts, how="left",
    )

    def with_ck(batch: pa.Table) -> pa.Table:
        # unmatched left rows surface cluster_id as null (float64 via
        # the pandas merge) -> coalesce to the doc's own id
        ck = pc.cast(
            pc.coalesce(
                pc.cast(batch["cluster_id"], pa.float64()),
                pc.cast(batch["doc_id"], pa.float64()),
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_chars": pc.cast(batch["n_chars"], pa.int64()),
                "ck": ck,
            }
        )

    aug = joined.map_batches(with_ck, batch_format="pyarrow")
    return _coarse_group_apply(aug, "ck", _best_per_cluster, num_parts)


def _closed_wedge_stream(
    edges: "ray.data.Dataset",
    src_col: str,
    dst_col: str,
    num_parts: int,
    with_apex: bool,
):
    """Shared degree-ordered wedge machinery (Suri & Vassilvitskii
    2011) behind ``triangle_count`` and ``local_clustering``.

    1. canonicalize to distinct UNDIRECTED edges (a < b) — coarse
       hash-partition dedupe, int64-only shuffle;
    2. degree table (combiner counts), broadcast SORTED via
       ``ray.put`` — node-count-sized, fine to ~10^8 nodes; beyond
       that the orientation lookup becomes two co-partition joins;
    3. orient every edge from its (degree, id)-smaller endpoint — each
       triangle then has exactly ONE wedge-closing orientation, and a
       node emits at most O(arboricity) out-neighbors, which kills the
       hub-wedge explosion (the "last reducer" of the naive version);
    4. group oriented edges by source, emit ordered wedges (v, w);
       union with the oriented edge set keyed by the SAME (v, w) pair
       hash; a coarse-partition vectorized membership intersect finds
       closed wedges.  Only (pair-hash, v, w[, apex]) int64 rows
       shuffle.

    Returns ``(und, deg_ref, closed)``: the distinct undirected edge
    set, the broadcast sorted (nodes, degrees) ref, and — per coarse
    pair partition — either one (n) count row (``with_apex=False``)
    or (node, t) triangle-membership partials covering all three
    vertices of every triangle (``with_apex=True``).
    """

    def canon(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        key = (
            a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + b.astype(np.uint64)
        )
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "ekey": pa.array(key, pa.uint64()),
            }
        )

    def dedupe(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["a", "b"])
        return pa.Table.from_pandas(
            df[["a", "b"]], preserve_index=False
        )

    und = _coarse_group_apply(
        edges.map_batches(canon, batch_format="pyarrow"),
        "ekey",
        dedupe,
        num_parts,
    ).materialize()  # consumed three times below (degrees, orient, wedges)

    def deg_partial(batch: pa.Table) -> pa.Table:
        n = np.concatenate(
            [
                batch["a"].to_numpy(zero_copy_only=False),
                batch["b"].to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(n, return_counts=True)
        return pa.table(
            {
                "node": pa.array(u, pa.int64()),
                "d": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    # per-block (node, count) partials are driver-bound (the degree
    # table is broadcast from the driver) — merge with numpy instead
    # of paying a shuffle round first; driver rows <= nodes x blocks,
    # same asymptotic contract as the broadcast table itself
    deg_parts = pa.concat_tables(
        ray.get(
            und.map_batches(
                deg_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    pn = deg_parts["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    pd_ = deg_parts["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(pn, return_inverse=True)  # sorted
    degs = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(degs, inv, pd_)
    deg_ref = ray.put((nodes, degs))

    def orient(batch: pa.Table) -> pa.Table:
        ns, ds_ = ray.get(deg_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = ds_[np.searchsorted(ns, a)]
        db = ds_[np.searchsorted(ns, b)]
        # orient from (deg, id)-smaller endpoint
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    oriented = und.map_batches(orient, batch_format="pyarrow")

    _PK = np.uint64(0x9E3779B97F4A7C15)

    def _empty_stream() -> pa.Table:
        cols = {
            "pkey": pa.array([], pa.uint64()),
            "x": pa.array([], pa.int64()),
            "y": pa.array([], pa.int64()),
            "is_edge": pa.array([], pa.int64()),
        }
        if with_apex:
            cols["w"] = pa.array([], pa.int64())
        return pa.table(cols)

    def edge_rows(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        key = u.astype(np.uint64) * _PK + v.astype(np.uint64)
        cols = {
            "pkey": pa.array(key, pa.uint64()),
            "x": pa.array(u, pa.int64()),
            "y": pa.array(v, pa.int64()),
            "is_edge": pa.array(np.ones(len(u), np.int64), pa.int64()),
        }
        if with_apex:
            cols["w"] = pa.array(np.zeros(len(u), np.int64), pa.int64())
        return pa.table(cols)

    def wedge_rows(part: pa.Table) -> pa.Table:
        # part holds all out-edges of a coarse set of sources; wedges
        # are ordered out-neighbor pairs per source, vectorized per
        # source segment
        u = part["u"].to_numpy(zero_copy_only=False)
        v = part["v"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        xs: list[np.ndarray] = []
        ys: list[np.ndarray] = []
        ws: list[np.ndarray] = []
        starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(u)]))
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            nb = v[s:e]
            x, y = nb[i], nb[j]
            # wedge (x, y) must follow the same orientation order the
            # closing edge would have: (deg, id)-sorted.  Out-neighbor
            # lists are in id order; re-orient by degree.
            xs.append(x)
            ys.append(y)
            if with_apex:
                ws.append(np.full(len(x), u[s], np.int64))
        if not xs:
            return _empty_stream()
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        ns, ds_ = ray.get(deg_ref)
        dx = ds_[np.searchsorted(ns, x)]
        dy = ds_[np.searchsorted(ns, y)]
        swap = (dy < dx) | ((dy == dx) & (y < x))
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        key = x2.astype(np.uint64) * _PK + y2.astype(np.uint64)
        cols = {
            "pkey": pa.array(key, pa.uint64()),
            "x": pa.array(x2, pa.int64()),
            "y": pa.array(y2, pa.int64()),
            "is_edge": pa.array(np.zeros(len(x2), np.int64), pa.int64()),
        }
        if with_apex:
            cols["w"] = pa.array(np.concatenate(ws), pa.int64())
        return pa.table(cols)

    wedges = _coarse_group_apply(oriented, "u", wedge_rows, num_parts)
    unioned = oriented.map_batches(edge_rows, batch_format="pyarrow").union(
        wedges
    )

    def count_closed(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        e = df[df["is_edge"] == 1][["x", "y"]]
        w = df[df["is_edge"] == 0]
        if len(e) == 0 or len(w) == 0:
            if with_apex:
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "t": pa.array([], pa.int64()),
                    }
                )
            return pa.table({"n": pa.array([0], pa.int64())})
        closed = w.merge(e, on=["x", "y"], how="inner")
        if not with_apex:
            return pa.table(
                {"n": pa.array([int(len(closed))], pa.int64())}
            )
        # every closed wedge is one triangle {apex, x, y}: each vertex
        # gains one membership; pre-count locally
        members = np.concatenate(
            [
                closed["w"].to_numpy(np.int64),
                closed["x"].to_numpy(np.int64),
                closed["y"].to_numpy(np.int64),
            ]
        )
        un, ct = np.unique(members, return_counts=True)
        return pa.table(
            {
                "node": pa.array(un, pa.int64()),
                "t": pa.array(ct.astype(np.int64), pa.int64()),
            }
        )

    closed = _coarse_group_apply(unioned, "pkey", count_closed, num_parts)
    return und, deg_ref, closed


def triangle_count(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_parts: int = 64,
) -> int:
    """EXACT global triangle count via degree-ordered wedge checking —
    see ``_closed_wedge_stream`` for the plan."""
    _, _, counted = _closed_wedge_stream(
        edges, src_col, dst_col, num_parts, with_apex=False
    )
    total = counted.sum("n")
    return int(total["sum(n)"] if isinstance(total, dict) else total)


def local_clustering(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """EXACT per-node triangle membership + degree — the integer core
    of the local clustering coefficient c(v) = 2*T(v) / (d(v)(d(v)-1))
    — via the same degree-ordered wedge stream as ``triangle_count``
    (wedge rows additionally carry their apex, so a closed wedge
    credits all three vertices).

    Zero-triangle nodes stay distributed: every undirected edge emits
    (endpoint, t=0) marker partials that union with the triangle
    partials before the (node) combiner, so no driver-side node-set
    difference is ever needed.  Output: (node, degree, n_triangles)
    for every node with degree >= 2, exact int64.
    """
    und, deg_ref, tri = _closed_wedge_stream(
        edges, src_col, dst_col, num_parts, with_apex=True
    )

    def zero_markers(batch: pa.Table) -> pa.Table:
        n = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False),
                    batch["b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "t": pa.array(np.zeros(len(n), np.int64), pa.int64()),
            }
        )

    merged = (
        tri.union(und.map_batches(zero_markers, batch_format="pyarrow"))
        .groupby("node")
        .sum("t")
    )

    def finish(batch: pa.Table) -> pa.Table:
        ns, ds_ = ray.get(deg_ref)
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch["sum(t)"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = ds_[np.searchsorted(ns, node)].astype(np.int64)
        keep = deg >= 2
        return pa.table(
            {
                "node": pa.array(node[keep], pa.int64()),
                "degree": pa.array(deg[keep], pa.int64()),
                "n_triangles": pa.array(t[keep], pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def _bfs_driver(
    src: np.ndarray, dst: np.ndarray, seed: np.ndarray, max_hops: int
) -> pa.Table:
    """Vectorized driver BFS on int64 edge arrays (CSR via argsort +
    searchsorted); used below ``BFS_DRIVER_MAX_EDGES``."""
    order = np.argsort(src, kind="mergesort")
    src_s, dst_s = src[order], dst[order]
    frontier = np.unique(seed)
    known = frontier.copy()  # sorted invariant
    out_nodes = [frontier]
    out_lvls = [np.zeros(frontier.size, np.int64)]
    for lvl in range(1, max_hops + 1):
        if frontier.size == 0:
            break
        lo = np.searchsorted(src_s, frontier, side="left")
        hi = np.searchsorted(src_s, frontier, side="right")
        spans = hi - lo
        total = int(spans.sum())
        if total == 0:
            break
        idx = np.repeat(lo, spans) + (
            np.arange(total) - np.repeat(np.cumsum(spans) - spans, spans)
        )
        cand = np.unique(dst_s[idx])
        pos = np.clip(np.searchsorted(known, cand), 0, known.size - 1)
        new = cand[known[pos] != cand] if known.size else cand
        if new.size == 0:
            break
        out_nodes.append(new)
        out_lvls.append(np.full(new.size, lvl, np.int64))
        known = np.union1d(known, new)
        frontier = new
    nodes = np.concatenate(out_nodes)
    lvls = np.concatenate(out_lvls)
    o = np.argsort(nodes)
    return pa.table(
        {
            "node": pa.array(nodes[o], pa.int64()),
            "level": pa.array(lvls[o], pa.int64()),
        }
    )


BFS_DRIVER_MAX_EDGES = 200_000


def bfs_levels(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    max_hops: int = 6,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """Exact BFS hop distance from a seed set over a directed edge
    Dataset ``(src, dst)``, bounded at ``max_hops``.  Returns one row
    ``(node, level)`` per node reachable within the bound (seeds at 0).

    The crawl analog: frontier depth from the seed catalogs — how many
    link hops a page is from any seed — which the reference encodes
    implicitly in its hub -> article two-level loop (reference
    ``collect_data.py`` round structure) and a general engine needs as
    an operator.

    Below ``driver_max_edges`` (default ``BFS_DRIVER_MAX_EDGES``) the
    int64 (src, dst) pairs — never payloads — come to the driver for a
    vectorized CSR BFS: each distributed round costs several whole
    Dataset executions of fixed overhead, which at small edge counts
    dwarfs the compute (the same threshold-switch as
    ``connected_components`` / ``pagerank``).  Pass 0 to force the
    distributed path.

    Distributed path: same shape as ``connected_components`` — levels
    live in a (node, lvl) Dataset; each round is ONE co-partition hash
    join (static edges x current levels) emitting ``(dst, lvl+1)``
    messages, then a coarse-partition min-reduce.  The loop stops early
    when the level-sum fixpoints (no new node, no shorter path).  Only
    the int64 level-sum hits the driver.
    """
    if driver_max_edges is None:
        driver_max_edges = BFS_DRIVER_MAX_EDGES
    if driver_max_edges > 0:
        edges = edges.materialize()
        if edges.count() <= driver_max_edges:
            etbl = pa.concat_tables(
                ray.get(edges.to_arrow_refs()), promote_options="default"
            )
            stbl = pa.concat_tables(
                ray.get(seeds.materialize().to_arrow_refs()),
                promote_options="default",
            )
            return ray.data.from_arrow(
                _bfs_driver(
                    etbl["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    etbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                    stbl["node"].to_numpy(zero_copy_only=False).astype(np.int64),
                    max_hops,
                )
            )

    def seed_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.int64()),
                "lvl": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
            }
        )

    levels = _coarse_group_apply(
        seeds.map_batches(seed_rows, batch_format="pyarrow"),
        "node",
        _min_lvl_by_node,
        num_parts,
    ).materialize()
    if levels.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "level": pa.array([], pa.int64()),
                }
            )
        )
    prev_sum, prev_n = int(levels.sum("lvl")), levels.count()

    for _ in range(max_hops):
        joined = hash_join(
            edges, levels, left_key="src", right_key="node",
            num_parts=num_parts,
        )

        def msg(batch: pa.Table) -> pa.Table:
            lv = batch["lvl"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": batch["dst"].cast(pa.int64()),
                    "lvl": pa.array(lv + 1, pa.int64()),
                }
            )

        msgs = joined.map_batches(msg, batch_format="pyarrow")
        levels = _coarse_group_apply(
            levels.union(msgs), "node", _min_lvl_by_node, num_parts
        ).materialize()
        cur_sum, cur_n = int(levels.sum("lvl")), levels.count()
        if cur_sum == prev_sum and cur_n == prev_n:
            break
        prev_sum, prev_n = cur_sum, cur_n

    def cap_and_rename(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch["lvl"], pa.scalar(max_hops))
        t = batch.filter(keep)
        return pa.table({"node": t["node"], "level": t["lvl"]})

    return levels.map_batches(cap_and_rename, batch_format="pyarrow")


def _min_lvl_by_node(tbl: pa.Table) -> pa.Table:
    df = tbl.to_pandas()
    out = df.groupby("node", sort=False)["lvl"].min().reset_index()
    return pa.table(
        {
            "node": pa.array(out["node"], pa.int64()),
            "lvl": pa.array(out["lvl"], pa.int64()),
        }
    )


# ------------------------------------------------------------- SSSP
_SSSP_INF = np.int64(2**62)


def _sssp_driver(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    seed: np.ndarray,
    max_rounds: int,
) -> pa.Table:
    """Vectorized driver Bellman-Ford: ``max_rounds`` simultaneous
    relaxation sweeps (``np.minimum.at``), early-stopped at fixpoint.
    Used below ``SSSP_DRIVER_MAX_EDGES`` (same threshold switch as
    ``bfs_levels``)."""
    nodes = np.unique(np.concatenate([src, dst, seed]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    dist = np.full(nodes.size, _SSSP_INF, np.int64)
    dist[np.searchsorted(nodes, np.unique(seed))] = 0
    for _ in range(max_rounds):
        nd = dist.copy()
        # unreachable sources stay INF: clip the candidate so INF + w
        # cannot overflow, then mask them out of the scatter
        reach = dist[si] < _SSSP_INF
        if reach.any():
            np.minimum.at(nd, di[reach], dist[si][reach] + w[reach])
        if np.array_equal(nd, dist):
            break
        dist = nd
    keep = dist < _SSSP_INF
    return pa.table(
        {
            "node": pa.array(nodes[keep], pa.int64()),
            "dist": pa.array(dist[keep], pa.int64()),
        }
    )


SSSP_DRIVER_MAX_EDGES = 200_000


def sssp_dists(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    max_rounds: int = 6,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """Weighted single-source(-set) shortest paths over a directed edge
    Dataset ``(src, dst, w)`` with non-negative int64 weights: exact
    Bellman-Ford distance using at most ``max_rounds`` relaxation
    sweeps (the weighted generalization of ``bfs_levels``; the crawl
    analog is politeness-cost-weighted frontier depth).  Returns one
    ``(node, dist)`` row per node reached within the bound (seeds at
    0).  Because simultaneous relaxation is monotone and idempotent at
    the fixpoint, early-stopping when no distance changes returns
    exactly the ``max_rounds``-sweep answer — both paths below and the
    unrolled-CTE SQL twin pin the same semantics.

    Below ``driver_max_edges`` the int64 (src, dst, w) triples solve on
    the driver (``_sssp_driver``); pass 0 to force the distributed
    path: per sweep ONE co-partition hash join (static weighted edges x
    current dists) emits ``(dst, dist + w)`` messages, then a
    coarse-partition vectorized min-reduce.  Only the (count, sum)
    fixpoint probe hits the driver.
    """
    if driver_max_edges is None:
        driver_max_edges = SSSP_DRIVER_MAX_EDGES
    if driver_max_edges > 0:
        edges = edges.materialize()
        if edges.count() <= driver_max_edges:
            etbl = pa.concat_tables(
                ray.get(edges.to_arrow_refs()), promote_options="default"
            )
            stbl = pa.concat_tables(
                ray.get(seeds.materialize().to_arrow_refs()),
                promote_options="default",
            )
            return ray.data.from_arrow(
                _sssp_driver(
                    etbl["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    etbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                    etbl["w"].to_numpy(zero_copy_only=False).astype(np.int64),
                    stbl["node"].to_numpy(zero_copy_only=False).astype(np.int64),
                    max_rounds,
                )
            )

    def seed_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.int64()),
                "d": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
            }
        )

    def _min_d_by_node(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        out = df.groupby("node", sort=False)["d"].min().reset_index()
        return pa.table(
            {
                "node": pa.array(out["node"], pa.int64()),
                "d": pa.array(out["d"], pa.int64()),
            }
        )

    dists = _coarse_group_apply(
        seeds.map_batches(seed_rows, batch_format="pyarrow"),
        "node",
        _min_d_by_node,
        num_parts,
    ).materialize()
    if dists.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        )
    prev = (dists.count(), int(dists.sum("d")))

    for _ in range(max_rounds):
        joined = hash_join(
            edges, dists, left_key="src", right_key="node",
            num_parts=num_parts,
        )

        def msg(batch: pa.Table) -> pa.Table:
            d = batch["d"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": batch["dst"].cast(pa.int64()),
                    "d": pa.array(d + w, pa.int64()),
                }
            )

        msgs = joined.map_batches(msg, batch_format="pyarrow")
        dists = _coarse_group_apply(
            dists.union(msgs), "node", _min_d_by_node, num_parts
        ).materialize()
        cur = (dists.count(), int(dists.sum("d")))
        if cur == prev:
            break
        prev = cur

    return dists.map_batches(
        lambda b: pa.table({"node": b["node"], "dist": b["d"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------- pointer jumping
def _pj_driver(
    node: np.ndarray, parent: np.ndarray, max_doublings: int
) -> pa.Table:
    order = np.argsort(node)
    n_s, p_s = node[order], parent[order]
    anc = np.searchsorted(n_s, p_s)  # parents exist as nodes
    d = (n_s[anc] != n_s).astype(np.int64)
    for _ in range(max_doublings):
        na = anc[anc]
        nd = d + d[anc]
        if np.array_equal(na, anc):
            break
        anc, d = na, nd
    return pa.table(
        {
            "node": pa.array(n_s, pa.int64()),
            "root": pa.array(n_s[anc], pa.int64()),
            "depth": pa.array(d, pa.int64()),
        }
    )


PJ_DRIVER_MAX_NODES = 500_000


def pointer_jump_roots(
    parents: "ray.data.Dataset",
    max_doublings: int = 20,
    num_parts: int = 64,
    driver_max_nodes: int | None = None,
) -> "ray.data.Dataset":
    """Root and depth of every node of a forest given as ``(node,
    parent)`` rows (roots point at themselves), by SUCCESSOR DOUBLING
    (pointer jumping, the classic PRAM list-ranking primitive): each
    round every node's ancestor pointer jumps to its ancestor's
    ancestor and the walked distance doubles, so a depth-D forest
    resolves in ceil(log2 D) rounds — each round ONE co-partition hash
    join of the state table with itself, instead of D sequential
    parent hops.  The hierarchy analog of ``bfs_levels``'s frontier
    rounds for chains too deep to iterate one level at a time.

    Every node's parent must itself appear as a node.  Below
    ``driver_max_nodes`` the int64 pairs solve on the driver
    (vectorized index-chasing); pass 0 to force the distributed path.
    Early stop at the ancestor fixpoint is exact: once every pointer
    reaches a root, further doubling is the identity.
    """
    if driver_max_nodes is None:
        driver_max_nodes = PJ_DRIVER_MAX_NODES
    if driver_max_nodes > 0:
        parents = parents.materialize()
        if parents.count() <= driver_max_nodes:
            tbl = pa.concat_tables(
                ray.get(parents.to_arrow_refs()), promote_options="default"
            )
            return ray.data.from_arrow(
                _pj_driver(
                    tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64),
                    tbl["parent"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    max_doublings,
                )
            )

    def init_state(batch: pa.Table) -> pa.Table:
        n = (
            batch["node"]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        p = (
            batch["parent"]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "anc": pa.array(p, pa.int64()),
                "d": pa.array((n != p).astype(np.int64), pa.int64()),
            }
        )

    state = parents.map_batches(
        init_state, batch_format="pyarrow"
    ).materialize()
    prev = int(state.sum("d"))

    for _ in range(max_doublings):
        lookup = state.map_batches(
            lambda b: pa.table(
                {
                    "node2": b["node"],
                    "anc2": b["anc"],
                    "d2": b["d"],
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            state, lookup, left_key="anc", right_key="node2",
            num_parts=num_parts,
        )

        def jump(batch: pa.Table) -> pa.Table:
            d = batch["d"].to_numpy(zero_copy_only=False)
            d2 = batch["d2"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": batch["node"].cast(pa.int64()),
                    "anc": batch["anc2"].cast(pa.int64()),
                    "d": pa.array(d + d2, pa.int64()),
                }
            )

        state = joined.map_batches(jump, batch_format="pyarrow").materialize()
        cur = int(state.sum("d"))
        if cur == prev:
            break
        prev = cur

    return state.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "root": b["anc"], "depth": b["d"]}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------- random walks
_RW_A = 1000003
_RW_B = 7919
_RW_C = 104729


def _rw_pick(seed, step, cur):
    """Deterministic neighbor index: the walk's 'randomness'.  Pure
    int arithmetic so the SQL twin reproduces it bit-for-bit."""
    return (seed * _RW_A + step * _RW_B + cur * _RW_C)


def _rw_driver(
    src: np.ndarray,
    dst: np.ndarray,
    seed: np.ndarray,
    length: int,
) -> pa.Table:
    o = np.lexsort((dst, src))
    src_s, dst_s = src[o], dst[o]
    keep = np.r_[
        True, (src_s[1:] != src_s[:-1]) | (dst_s[1:] != dst_s[:-1])
    ]
    src_s, dst_s = src_s[keep], dst_s[keep]  # DISTINCT edges, like SQL
    uniq = np.unique(src_s)
    lo = np.searchsorted(src_s, uniq, side="left")
    hi = np.searchsorted(src_s, uniq, side="right")
    seeds = np.unique(seed)
    cur = seeds.copy()
    alive = np.ones(cur.size, bool)
    out_seed = [seeds]
    out_step = [np.zeros(seeds.size, np.int64)]
    out_node = [seeds.copy()]
    for k in range(1, length + 1):
        pos = np.searchsorted(uniq, cur)
        pos = np.clip(pos, 0, uniq.size - 1)
        has = alive & (uniq[pos] == cur) if uniq.size else np.zeros_like(alive)
        deg = np.where(has, hi[pos] - lo[pos], 1)
        r = _rw_pick(seeds, k, cur) % deg
        nxt = np.where(has, dst_s[np.clip(lo[pos] + r, 0, dst_s.size - 1)], cur)
        alive = has
        cur = np.where(alive, nxt, cur)
        if not alive.any():
            break
        out_seed.append(seeds[alive])
        out_step.append(np.full(int(alive.sum()), k, np.int64))
        out_node.append(cur[alive])
    return pa.table(
        {
            "seed": pa.array(np.concatenate(out_seed), pa.int64()),
            "step": pa.array(np.concatenate(out_step), pa.int64()),
            "node": pa.array(np.concatenate(out_node), pa.int64()),
        }
    )


RW_DRIVER_MAX_EDGES = 200_000
_RW_PK = np.uint64(0x9E3779B97F4A7C15)


_RW_RANK_BITS = np.int64(1) << 21  # max out-degree the key packs


def _pair_key(node: np.ndarray, rank: np.ndarray) -> np.ndarray:
    """EXACT composite (node, rank) key — collision-free by
    construction (node < 2^42, rank < 2^21), unlike a hash mix, so
    the ranked-neighbor join can never pick a wrong edge."""
    return node.astype(np.int64) * _RW_RANK_BITS + rank.astype(np.int64)


def random_walks(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    length: int = 5,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """DeepWalk-style walk corpus generation (Perozzi et al. 2014):
    one walk of up to ``length`` steps per distinct seed over a
    directed edge Dataset ``(src, dst)``, choosing the next neighbor
    DETERMINISTICALLY — neighbors ranked in (src, dst) order, index
    ``(seed*1000003 + step*7919 + cur*104729) % degree`` — so the walk
    corpus is reproducible at any partition count and a SQL twin can
    replay it exactly.  Returns ``(seed, step, node)`` rows including
    step 0; a walk stops early at a node with no out-edges.

    Below ``driver_max_edges`` the int64 edges solve on the driver
    (vectorized CSR chase).  Distributed path per step: ONE
    co-partition join attaches the current node's degree, then one
    (node, rank)-keyed co-partition join picks the ranked neighbor —
    the walk state (one row per live walk) never exceeds the seed
    count, and the ranked edge table is built once and reused by every
    step.
    """
    if driver_max_edges is None:
        driver_max_edges = RW_DRIVER_MAX_EDGES
    if driver_max_edges > 0:
        edges = edges.materialize()
        if edges.count() <= driver_max_edges:
            etbl = pa.concat_tables(
                ray.get(edges.to_arrow_refs()), promote_options="default"
            )
            stbl = pa.concat_tables(
                ray.get(seeds.materialize().to_arrow_refs()),
                promote_options="default",
            )
            return ray.data.from_arrow(
                _rw_driver(
                    etbl["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    etbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                    stbl["node"].to_numpy(zero_copy_only=False).astype(np.int64),
                    length,
                )
            )

    # ranked edge table: per-src (deg, rank) — built once, reused
    def rank_edges(part: pa.Table) -> pa.Table:
        import pandas as pd

        df = part.to_pandas().sort_values(["src", "dst"], kind="mergesort")
        s = df["src"].to_numpy()
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        local = np.arange(len(df)) - np.repeat(
            starts, np.diff(np.r_[starts, len(df)])
        )
        return pa.table(
            {
                "pk": pa.array(
                    _pair_key(s, local.astype(np.int64)), pa.int64()
                ),
                "nxt": pa.array(df["dst"].to_numpy(np.int64), pa.int64()),
            }
        )

    def deg_part(part: pa.Table) -> pa.Table:
        u, c = np.unique(
            part["src"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "dn": pa.array(u, pa.int64()),
                "deg": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def as_int_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch["src"].cast(pa.int64()),
                "dst": batch["dst"].cast(pa.int64()),
            }
        )

    def _dedup_edges(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["src", "dst"])
        return pa.Table.from_pandas(df, preserve_index=False)

    # ranks and degrees must agree on the DISTINCT edge set (the SQL
    # twin ranks over DISTINCT edges), so dedupe once, up front
    ints = _coarse_group_apply(
        edges.map_batches(as_int_edges, batch_format="pyarrow"),
        "src",
        _dedup_edges,
        num_parts,
    ).materialize()
    ranked = _coarse_group_apply(
        ints, "src", rank_edges, num_parts
    ).materialize()
    degs = _coarse_group_apply(ints, "src", deg_part, num_parts).materialize()

    def seed_state(batch: pa.Table) -> pa.Table:
        n = (
            batch["node"]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = np.unique(n)
        return pa.table(
            {
                "seed": pa.array(n, pa.int64()),
                "cur": pa.array(n, pa.int64()),
            }
        )

    def _dedup_seeds(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["seed"])
        return pa.Table.from_pandas(df, preserve_index=False)

    # per-batch unique above is local; one coarse pass makes it global
    state = _coarse_group_apply(
        seeds.map_batches(seed_state, batch_format="pyarrow"),
        "seed",
        _dedup_seeds,
        num_parts,
    )
    outputs = [
        state.map_batches(
            lambda b: pa.table(
                {
                    "seed": b["seed"],
                    "step": pa.array(
                        np.zeros(b.num_rows, np.int64), pa.int64()
                    ),
                    "node": b["cur"],
                }
            ),
            batch_format="pyarrow",
        )
    ]

    for k in range(1, length + 1):
        with_deg = hash_join(
            state, degs, left_key="cur", right_key="dn", num_parts=num_parts
        )

        def pick(batch: pa.Table, _k=k) -> pa.Table:
            s = batch["seed"].to_numpy(zero_copy_only=False)
            c = batch["cur"].to_numpy(zero_copy_only=False)
            d = batch["deg"].to_numpy(zero_copy_only=False)
            r = _rw_pick(s, _k, c) % d
            return pa.table(
                {
                    "seed": pa.array(s, pa.int64()),
                    "pk2": pa.array(_pair_key(c, r), pa.int64()),
                }
            )

        keyed = with_deg.map_batches(pick, batch_format="pyarrow")
        stepped = hash_join(
            keyed, ranked, left_key="pk2", right_key="pk", num_parts=num_parts
        )
        state = stepped.map_batches(
            lambda b: pa.table({"seed": b["seed"], "cur": b["nxt"]}),
            batch_format="pyarrow",
        ).materialize()
        if state.count() == 0:
            break
        outputs.append(
            state.map_batches(
                lambda b, _k=k: pa.table(
                    {
                        "seed": b["seed"],
                        "step": pa.array(
                            np.full(b.num_rows, _k, np.int64), pa.int64()
                        ),
                        "node": b["cur"],
                    }
                ),
                batch_format="pyarrow",
            )
        )

    out = outputs[0]
    for ds_ in outputs[1:]:
        out = out.union(ds_)
    return out


# ------------------------------------------------ neighborhood agg
def _na_driver(
    src: np.ndarray,
    dst: np.ndarray,
    fnode: np.ndarray,
    fval: np.ndarray,
    hops: int,
) -> pa.Table:
    """Vectorized driver aggregation: dedup edges, then one
    ``np.add.at`` scatter per hop over the dense node index."""
    o = np.lexsort((dst, src))
    s, d = src[o], dst[o]
    keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
    s, d = s[keep], d[keep]
    nodes = np.unique(np.concatenate([s, d, fnode]))
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    fi = np.searchsorted(nodes, fnode)
    cur = np.zeros(nodes.size, np.int64)
    cur[fi] = fval
    levels = []
    for _ in range(hops):
        nxt = np.zeros(nodes.size, np.int64)
        np.add.at(nxt, si, cur[di])
        levels.append(nxt)
        cur = nxt
    out = {
        "node": pa.array(fnode, pa.int64()),
        "f": pa.array(fval, pa.int64()),
    }
    for h, lvl in enumerate(levels, start=1):
        out[f"s{h}"] = pa.array(lvl[fi], pa.int64())
    return pa.table(out)


NA_DRIVER_MAX_EDGES = 200_000


def neighborhood_agg(
    edges: "ray.data.Dataset",
    feats: "ray.data.Dataset",
    hops: int = 2,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """GNN-style neighborhood feature aggregation (the GraphSAGE /
    message-passing prep step): for every node, the exact sum of its
    neighbors' integer feature, iterated ``hops`` times (hop h sums
    hop h-1 over the same static edge table).  Inputs: ``edges`` as
    ``(src, dst)`` rows (need not be distinct — deduped once here) and
    ``feats`` as ``(node, f)`` int64 rows, unique per node.  Returns
    ``(node, f, s1..s{hops})`` with 0 where a hop has no contributors.

    Per hop: ONE co-partition hash join (static edges x previous hop's
    (node, val) table, keyed on dst) followed by a per-batch partial
    sum per src and a coarse keyed sum — one aggregate-sized row per
    (batch, src) on the wire, never the neighbor lists.  The final
    assembly is a single coarse union-pivot, not per-node joins.

    Below ``driver_max_edges`` (default ``NA_DRIVER_MAX_EDGES``) the
    int64 edges and features solve on the driver with one vectorized
    scatter per hop — the usual small-graph threshold switch; pass 0
    to force the distributed path (pytest pins both equal).
    """
    import pandas as pd

    if driver_max_edges is None:
        driver_max_edges = NA_DRIVER_MAX_EDGES
    if driver_max_edges > 0:
        edges = edges.materialize()
        if edges.count() <= driver_max_edges:
            etbl = pa.concat_tables(
                ray.get(edges.to_arrow_refs()), promote_options="default"
            )
            # feats may arrive as pandas blocks (groupby upstream);
            # to_pandas handles both block formats
            fdf = feats.to_pandas()
            return ray.data.from_arrow(
                _na_driver(
                    etbl["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                    etbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                    fdf["node"].to_numpy(dtype=np.int64),
                    fdf["f"].to_numpy(dtype=np.int64),
                    hops,
                )
            )

    def as_int_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch["src"].cast(pa.int64()),
                "dst": batch["dst"].cast(pa.int64()),
            }
        )

    def _dedup_edges(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["src", "dst"])
        return pa.Table.from_pandas(df, preserve_index=False)

    ed = _coarse_group_apply(
        edges.map_batches(as_int_edges, batch_format="pyarrow"),
        "src",
        _dedup_edges,
        num_parts,
    ).materialize()

    def base_vals(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.int64()),
                "val": batch["f"].cast(pa.int64()),
            }
        )

    cur = feats.map_batches(base_vals, batch_format="pyarrow")
    levels = []  # (hop, Dataset of (node, val))

    def _sum_by_node(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        g = df.groupby("node", as_index=False)["val"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    for _h in range(1, hops + 1):
        joined = hash_join(
            ed, cur, left_key="dst", right_key="node", num_parts=num_parts
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("src", as_index=False)["val"].sum()
            return pa.table(
                {
                    "node": pa.array(g["src"].to_numpy(np.int64), pa.int64()),
                    "val": pa.array(g["val"].to_numpy(np.int64), pa.int64()),
                }
            )

        cur = _coarse_group_apply(
            joined.map_batches(partial, batch_format="pyarrow"),
            "node",
            _sum_by_node,
            num_parts,
        ).materialize()
        levels.append(cur)

    # assemble (node, f, s1..sH) in ONE coarse union-pivot
    def tag(h: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch["node"].cast(pa.int64()),
                    "val": batch["val"].cast(pa.int64()),
                    "h": pa.array(
                        np.full(batch.num_rows, h, np.int64), pa.int64()
                    ),
                }
            )

        return fn

    unioned = feats.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"].cast(pa.int64()),
                "val": b["f"].cast(pa.int64()),
                "h": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    for h, lvl in enumerate(levels, start=1):
        unioned = unioned.union(lvl.map_batches(tag(h), batch_format="pyarrow"))

    cols = ["f"] + [f"s{h}" for h in range(1, hops + 1)]

    def pivot(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        wide = df.pivot_table(
            index="node", columns="h", values="val", aggfunc="first"
        ).reindex(columns=list(range(hops + 1)))
        # only nodes present in feats (h == 0) are emitted
        wide = wide[wide[0].notna()].fillna(0)
        out = {"node": wide.index.to_numpy(dtype=np.int64)}
        for i, c in enumerate(cols):
            out[c] = wide[i].to_numpy(dtype=np.int64)
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in out.items()}
        )

    return _coarse_group_apply(unioned, "node", pivot, num_parts)


# ------------------------------------------- harmonic centrality
# Harmonic centrality of v: sum over sources u != v reaching v of
# 1/d(u, v), hop distances bounded at max_hops (Boldi & Vigna, "Axioms
# for Centrality", 2014 — the web-graph ranking Common Crawl publishes
# alongside PageRank for its host-graph releases).  Fixed-point: each
# reached source credits HC_SCALE // d, an exact int64 floor division,
# so a recursive-CTE SQL twin hash-matches bit-exactly.
#
# The EXACT operator is inherently all-(reachable)-pairs — right for
# the oracle and for bounded graphs (the host graph, not the page
# graph).  The 100-TB shape is ``hyperball_harmonic`` below: per-node
# HyperLogLog neighborhood sketches merged along edges (HyperBall,
# Boldi & Vigna 2013), O(N * 2^p) state instead of O(N^2) pairs, with
# an oracle-green guard pinning the estimates to exact ball sizes.

HC_SCALE = 1_000_000_000
HC_DRIVER_MAX_EDGES = 200_000
HC_DRIVER_MAX_NODES = 20_000  # the dist matrix is n^2 — cap it


def _to_sd(src_col: str, dst_col: str):
    def to_sd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch[src_col].combine_chunks().cast(pa.int64()),
                "dst": batch[dst_col].combine_chunks().cast(pa.int64()),
            }
        )

    return to_sd


def _reach_dist_matrix(
    src: np.ndarray, dst: np.ndarray, max_hops: int
) -> tuple[np.ndarray, np.ndarray]:
    """Driver path: simultaneous BFS from every node as an
    (n_sources x n_nodes) boolean frontier matrix, one scatter-OR per
    hop.  Returns (sorted node ids, dist matrix; unreached = 2^62)."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    INF = np.int64(2**62)
    dist = np.full((n, n), INF, np.int64)
    idx = np.arange(n)
    dist[idx, idx] = 0
    frontier = np.zeros((n, n), dtype=bool)
    frontier[idx, idx] = True
    for t in range(1, max_hops + 1):
        msg = np.zeros((n, n), dtype=bool)
        # msg[s, dst_e] |= frontier[s, src_e] for every edge
        np.logical_or.at(msg, (slice(None), di), frontier[:, si])
        frontier = msg & (dist == INF)
        if not frontier.any():
            break
        dist[frontier] = t
    return nodes, dist


def _pair_min_d(tbl: pa.Table) -> pa.Table:
    df = tbl.to_pandas()
    out = df.groupby(["s", "v"], sort=False)["d"].min().reset_index()
    return pa.table(
        {
            "s": pa.array(out["s"], pa.int64()),
            "v": pa.array(out["v"], pa.int64()),
            "d": pa.array(out["d"], pa.int64()),
        }
    )


def _mix_sv(s: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Deterministic partition key for (source, node) pairs — only used
    to co-locate rows of the same pair; exact grouping happens inside
    the partition."""
    h = s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h ^= v.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(29)
    return h.view(np.int64)


def _reach_pairs_distributed(
    e: "ray.data.Dataset", max_hops: int, num_parts: int
) -> "ray.data.Dataset":
    """Distributed hop-bounded all-sources reachability: (s, v, d) rows
    with d = min hop distance from s to v (seeds: (u, u, 0) for every
    node).  Each round is ONE co-partition hash join (static edges x
    current frontier) + a coarse pair-min reduce, early-stopped when no
    pair improves.  ``e`` must have int64 (src, dst) columns."""

    def seed_pairs(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        return pa.table(
            {
                "s": pa.array(u, pa.int64()),
                "v": pa.array(u, pa.int64()),
                "d": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    def coarse_pair_apply(ds):
        def add_key(batch: pa.Table) -> pa.Table:
            k = _mix_sv(
                batch["s"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            )
            return batch.append_column("__pk", pa.array(k, pa.int64()))

        keyed = ds.map_batches(add_key, batch_format="pyarrow")
        return _coarse_group_apply(
            keyed,
            "__pk",
            lambda t: _pair_min_d(t.drop_columns(["__pk"])),
            num_parts,
        )

    visited = coarse_pair_apply(
        e.map_batches(seed_pairs, batch_format="pyarrow")
    ).materialize()
    frontier = visited
    for t in range(1, max_hops + 1):
        joined = hash_join(
            e, frontier, left_key="src", right_key="v",
            num_parts=num_parts,
        )

        def expand(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "s": batch["s"].combine_chunks().cast(pa.int64()),
                    "v": batch["dst"].combine_chunks().cast(pa.int64()),
                    "d": pa.array(
                        batch["d"].to_numpy(zero_copy_only=False) + 1,
                        pa.int64(),
                    ),
                }
            )

        msgs = joined.map_batches(expand, batch_format="pyarrow")
        visited = coarse_pair_apply(visited.union(msgs)).materialize()

        def only_new(batch: pa.Table, _t=t) -> pa.Table:
            return batch.filter(
                pc.equal(batch["d"], pa.scalar(_t, pa.int64()))
            )

        frontier = visited.map_batches(
            only_new, batch_format="pyarrow"
        ).materialize()
        if frontier.count() == 0:
            break
    return visited


def harmonic_centrality(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 6,
    scale: int = HC_SCALE,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """Exact hop-bounded harmonic centrality over a directed edge
    Dataset: ``hc_rank(v) = sum over u != v with d(u, v) <= max_hops of
    scale // d(u, v)`` (int64, bit-reproducible at any partition
    count).  Returns one ``(node, hc_rank)`` row per node appearing in
    any edge (0 when nothing reaches it).

    Threshold-switched: below ``driver_max_edges`` (and
    ``HC_DRIVER_MAX_NODES``) the int64 edge pairs run the driver
    frontier-matrix BFS; above, ``_reach_pairs_distributed`` carries
    (source, node, dist) rows.  Exact harmonic is inherently all-pairs
    state — use ``hyperball_harmonic`` when the graph outgrows it.
    """
    if driver_max_edges is None:
        driver_max_edges = HC_DRIVER_MAX_EDGES
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "hc_rank": pa.array([], pa.int64()),
                }
            )
        )
    if driver_max_edges > 0 and n_edges <= driver_max_edges:
        tbl = pa.concat_tables(
            ray.get(edges.to_arrow_refs()), promote_options="default"
        )
        s = tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(np.unique(np.concatenate([s, d]))) <= HC_DRIVER_MAX_NODES:
            nodes, dist = _reach_dist_matrix(s, d, max_hops)
            reach = (dist >= 1) & (dist <= max_hops)
            contrib = np.where(
                reach, scale // np.where(reach, dist, 1), 0
            )
            hc = contrib.sum(axis=0, dtype=np.int64)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(
                            nodes.astype(np.int64), pa.int64()
                        ),
                        "hc_rank": pa.array(hc, pa.int64()),
                    }
                )
            )

    e = edges.map_batches(
        _to_sd(src_col, dst_col), batch_format="pyarrow"
    )
    visited = _reach_pairs_distributed(e, max_hops, num_parts)

    def hc_partial(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False)
        credit = np.where(
            (d >= 1) & (d <= max_hops), scale // np.maximum(d, 1), 0
        ).astype(np.int64)
        return pa.table(
            {
                "node": batch["v"].combine_chunks().cast(pa.int64()),
                "c": pa.array(credit, pa.int64()),
            }
        )

    def hc_merge(g: pa.Table) -> pa.Table:
        tt = g.group_by("node").aggregate([("c", "sum")])
        return pa.table(
            {
                "node": tt["node"].combine_chunks().cast(pa.int64()),
                "hc_rank": tt["c_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    return _coarse_group_apply(
        visited.map_batches(hc_partial, batch_format="pyarrow"),
        "node",
        hc_merge,
        num_parts,
    )


def ball_sizes_exact(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 6,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """Exact incoming-ball sizes: ``ball(v) = |{u : d(u, v) <=
    max_hops}|`` including v itself — the quantity HyperBall
    estimates; the guard query pins the estimates to this.  Same
    threshold switch and pair machinery as ``harmonic_centrality``."""
    if driver_max_edges is None:
        driver_max_edges = HC_DRIVER_MAX_EDGES
    edges = edges.materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "ball": pa.array([], pa.int64()),
                }
            )
        )
    if driver_max_edges > 0 and edges.count() <= driver_max_edges:
        tbl = pa.concat_tables(
            ray.get(edges.to_arrow_refs()), promote_options="default"
        )
        s = tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(np.unique(np.concatenate([s, d]))) <= HC_DRIVER_MAX_NODES:
            nodes, dist = _reach_dist_matrix(s, d, max_hops)
            ball = (dist <= max_hops).sum(axis=0).astype(np.int64)
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array(
                            nodes.astype(np.int64), pa.int64()
                        ),
                        "ball": pa.array(ball, pa.int64()),
                    }
                )
            )

    e = edges.map_batches(
        _to_sd(src_col, dst_col), batch_format="pyarrow"
    )
    visited = _reach_pairs_distributed(e, max_hops, num_parts)

    def ball_partial(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch["v"].combine_chunks().cast(pa.int64()),
                "c": pa.array(
                    (d <= max_hops).astype(np.int64), pa.int64()
                ),
            }
        )

    def ball_merge(g: pa.Table) -> pa.Table:
        tt = g.group_by("node").aggregate([("c", "sum")])
        return pa.table(
            {
                "node": tt["node"].combine_chunks().cast(pa.int64()),
                "ball": tt["c_sum"].combine_chunks().cast(pa.int64()),
            }
        )

    return _coarse_group_apply(
        visited.map_batches(ball_partial, batch_format="pyarrow"),
        "node",
        ball_merge,
        num_parts,
    )


# ------------------------------------------------------ HyperBall
HB_P = 10  # 2^10 registers = 1 KiB per node


def _hll_rank_of(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) of each 64-bit hash — the same split as
    ``sketch.HyperLogLog.add_hashes`` (top p bits index, then the
    1-based position of the first 1-bit in the rest)."""
    h = np.asarray(h, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rank = np.zeros(len(h), dtype=np.uint8)
    rem = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    for r in range(1, 64 - p + 1):
        top = (rem >> np.uint64(63)) & np.uint64(1)
        rank[(rank == 0) & (top == 1)] = r
        rem = (rem << np.uint64(1)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        if not (rank == 0).any():
            break
    rank[rank == 0] = 64 - p + 1
    return idx, rank


def _hll_est_rows(regs: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimate of an (n_nodes x m) uint8 register matrix
    — identical arithmetic to ``sketch.HyperLogLog.estimate`` (incl.
    the linear-counting small-range correction)."""
    m = float(regs.shape[1])
    alpha = 0.7213 / (1 + 1.079 / m)
    z = 1.0 / np.sum(2.0 ** -regs.astype(np.float64), axis=1)
    e = alpha * m * m * z
    zeros = (regs == 0).sum(axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lc, e)


def _hyperball_driver(
    src: np.ndarray, dst: np.ndarray, max_hops: int, p: int
) -> pa.Table:
    from .sketch import _id_hash

    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    m = 1 << p
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    idx, rank = _hll_rank_of(_id_hash(nodes), p)
    regs = np.zeros((n, m), dtype=np.uint8)
    regs[np.arange(n), idx] = rank
    prev = _hll_est_rows(regs)
    hc = np.zeros(n, dtype=np.float64)
    for t in range(1, max_hops + 1):
        new = regs.copy()
        # merge src sketches into dst: B(v, t) ⊇ B(u, t-1) for u -> v
        np.maximum.at(new, di, regs[si])
        if np.array_equal(new, regs):
            break
        regs = new
        cur = _hll_est_rows(regs)
        hc += np.maximum(cur - prev, 0.0) / float(t)
        prev = cur
    return pa.table(
        {
            "node": pa.array(nodes.astype(np.int64), pa.int64()),
            "ball_est": pa.array(prev, pa.float64()),
            "hc_est": pa.array(hc, pa.float64()),
        }
    )


def hyperball_harmonic(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 6,
    p: int = HB_P,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """HyperBall (Boldi & Vigna 2013): approximate harmonic centrality
    + incoming-ball size per node via per-node HyperLogLog neighborhood
    sketches merged along edges — ``B(v, t) = {v} ∪ ⋃_{u->v} B(u,
    t-1)`` becomes a register-wise max, so per hop the state is ONE
    (node, 2^p bytes) row per node instead of the exact operator's
    O(N^2) reachable pairs.  This is the 100-TB path for centrality
    over the page/host webgraph (the algorithm behind the published
    Common Crawl / WebDataCommons centrality rankings).

    Returns ``(node, ball_est, hc_est)`` — float64 estimates;
    deterministic (fixed splitmix hash, order-independent register
    max), so the distributed path equals the driver path bitwise.
    Accuracy is pinned by the oracle-green guard query
    (``hyperball_ball_guard``): estimates vs exact ball sizes.
    """
    if driver_max_edges is None:
        driver_max_edges = HC_DRIVER_MAX_EDGES
    edges = edges.materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "ball_est": pa.array([], pa.float64()),
                    "hc_est": pa.array([], pa.float64()),
                }
            )
        )
    if driver_max_edges > 0 and edges.count() <= driver_max_edges:
        tbl = pa.concat_tables(
            ray.get(edges.to_arrow_refs()), promote_options="default"
        )
        return ray.data.from_arrow(
            _hyperball_driver(
                tbl[src_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                tbl[dst_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                max_hops,
                p,
            )
        )

    from .sketch import _id_hash

    m = 1 << p
    e = edges.map_batches(
        _to_sd(src_col, dst_col), batch_format="pyarrow"
    ).materialize()

    def seed_sketches(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        idx, rank = _hll_rank_of(_id_hash(u), p)
        regs = np.zeros((len(u), m), dtype=np.uint8)
        regs[np.arange(len(u)), idx] = rank
        est = _hll_est_rows(regs)
        return pa.table(
            {
                "node": pa.array(u, pa.int64()),
                "reg": pa.array(
                    [regs[i].tobytes() for i in range(len(u))],
                    pa.binary(),
                ),
                "prev": pa.array(est, pa.float64()),
                "hc": pa.array(np.zeros(len(u)), pa.float64()),
            }
        )

    # duplicate node rows across batches collapse to one via the same
    # merge the iteration uses (identical seeds merge to themselves)
    def merge_group(t_round: int):
        def merge(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            out_node, out_reg, out_prev, out_hc = [], [], [], []
            for node, grp in df.groupby("node", sort=False):
                stack = np.frombuffer(
                    b"".join(grp["reg"].tolist()), dtype=np.uint8
                ).reshape(len(grp), m)
                merged = stack.max(axis=0)
                prevs = grp["prev"].to_numpy()
                hcs = grp["hc"].to_numpy()
                own = prevs >= 0
                prev = float(prevs[own][0]) if own.any() else 0.0
                hc = float(hcs[own][0]) if own.any() else 0.0
                est = float(_hll_est_rows(merged[None, :])[0])
                if t_round > 0:
                    hc += max(est - prev, 0.0) / float(t_round)
                out_node.append(node)
                out_reg.append(merged.tobytes())
                out_prev.append(est)
                out_hc.append(hc)
            return pa.table(
                {
                    "node": pa.array(out_node, pa.int64()),
                    "reg": pa.array(out_reg, pa.binary()),
                    "prev": pa.array(out_prev, pa.float64()),
                    "hc": pa.array(out_hc, pa.float64()),
                }
            )

        return merge

    sketches = _coarse_group_apply(
        e.map_batches(seed_sketches, batch_format="pyarrow"),
        "node",
        merge_group(0),
        num_parts,
    ).materialize()

    for t in range(1, max_hops + 1):
        joined = hash_join(
            e, sketches, left_key="src", right_key="node",
            num_parts=num_parts,
        )

        def msg(batch: pa.Table) -> pa.Table:
            nr = batch.num_rows
            return pa.table(
                {
                    "node": batch["dst"].combine_chunks().cast(pa.int64()),
                    "reg": batch["reg"],
                    "prev": pa.array(np.full(nr, -1.0), pa.float64()),
                    "hc": pa.array(np.full(nr, -1.0), pa.float64()),
                }
            )

        msgs = joined.map_batches(msg, batch_format="pyarrow")
        sketches = _coarse_group_apply(
            sketches.union(msgs), "node", merge_group(t), num_parts
        ).materialize()

    return sketches.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "ball_est": b["prev"],
                "hc_est": b["hc"],
            }
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------- k-core
def drop_empty_blocks(ds: "ray.data.Dataset"):
    """Rebuild a MATERIALIZED Dataset from only its non-empty blocks.

    Ray's shuffle operators occasionally emit zero-row blocks with an
    EMPTY schema, and ``map_batches`` passes such blocks through
    WITHOUT invoking the UDF — one degenerate block then poisons a
    downstream concat/`to_pandas` with a schema mismatch.  Zero-row
    blocks are always safe to drop; this is metadata-only (no block is
    fetched).  Returns ``None`` when every block is empty — callers
    substitute their explicit empty-schema table."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def k_core(
    edges: "ray.data.Dataset",
    k: int = 3,
    max_iters: int = 8,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_nodes: int = 2_000_000,
) -> "ray.data.Dataset":
    """k-core of an undirected graph by iterative peel (Seidman 1983;
    Batagelj & Zaversnik's peel order, bulk-synchronous form): drop
    every node whose degree is < ``k``, recompute degrees on the
    surviving subgraph, repeat to fixpoint (or ``max_iters``).  Returns
    ``(node, deg)`` — the nodes of the final subgraph with their degree
    inside it.  The web-curation use: a host-graph k-core separates the
    densely interlinked "core web" worth deep recrawl budget from
    peripheral leaf hosts (the reference hard-codes this prior by only
    ever crawling its 14 hub exchanges, reference ``collect_data.py``).

    Scale shape: the directed input is symmetrized + deduped with ONE
    shuffle; each peel round is one node-bounded ``groupby().count()``
    plus an endpoint filter.  The alive-node set is broadcast
    (``ray.put`` once, ``np.isin`` per batch) while it fits
    ``broadcast_max_nodes``; above that the filter switches to two
    co-partition semi-joins (``stages/join.py:semi_anti_join``) — the
    same threshold-switch pattern as ``CC_DRIVER_MAX_PAIRS``.
    Convergence (no node dropped) stops the loop early; running the
    remaining rounds would be a no-op, which is what keeps the
    fixed-``max_iters`` unrolled-CTE SQL twin bit-identical.
    """
    from .join import semi_anti_join

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[src].combine_chunks().cast(pa.int64())
        b = batch[dst].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                src: pa.concat_arrays([a, b]),
                dst: pa.concat_arrays([b, a]),
            }
        )

    und = (
        edges.map_batches(symmetrize, batch_format="pyarrow")
        .groupby([src, dst])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def degrees(e: "ray.data.Dataset") -> "ray.data.Dataset":
        g = e.groupby(src).count()

        def shape(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch[src].combine_chunks().cast(pa.int64()),
                    "deg": batch["count()"].combine_chunks().cast(pa.int64()),
                }
            )

        return g.map_batches(shape, batch_format="pyarrow")

    for _ in range(max_iters):
        deg = degrees(und).materialize()
        n_nodes = deg.count()
        if n_nodes == 0:
            break
        alive = deg.map_batches(
            lambda b, _k=k: b.filter(pc.greater_equal(b["deg"], _k)),
            batch_format="pyarrow",
        ).materialize()
        n_alive = alive.count()
        if n_alive == n_nodes:
            break  # fixpoint: no node dropped, further rounds no-op
        if n_alive == 0:
            und = ray.data.from_arrow(
                pa.table(
                    {src: pa.array([], pa.int64()), dst: pa.array([], pa.int64())}
                )
            )
            break
        if n_alive <= broadcast_max_nodes:
            ids = np.sort(
                pa.concat_tables(ray.get(alive.to_arrow_refs()))["node"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            ids_ref = ray.put(ids)

            def keep_alive(batch: pa.Table, _ref=ids_ref) -> pa.Table:
                keep_ids = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
                a = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
                b = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
                pos_a = np.searchsorted(keep_ids, a)
                pos_b = np.searchsorted(keep_ids, b)
                in_a = (pos_a < len(keep_ids)) & (keep_ids[np.minimum(pos_a, len(keep_ids) - 1)] == a)
                in_b = (pos_b < len(keep_ids)) & (keep_ids[np.minimum(pos_b, len(keep_ids) - 1)] == b)
                return batch.filter(pa.array(in_a & in_b))

            und = und.map_batches(
                keep_alive, batch_format="pyarrow"
            ).materialize()
        else:
            und = semi_anti_join(und, alive, src, "node")
            und = semi_anti_join(und, alive, dst, "node").materialize()

    out = degrees(und).materialize()
    # scrub zero-row blocks: the peel loop's shuffles can emit
    # schema-less empties that poison downstream concat (flaky,
    # partition-count-dependent; see drop_empty_blocks)
    out = drop_empty_blocks(out)
    if out is None or out.count() == 0:
        # a fully peeled graph yields zero blocks — return an explicit
        # empty table so consumers still see the (node, deg) schema
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
            )
        )
    return out


def _lpa_pick(
    d: np.ndarray, lab: np.ndarray, c: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dst argmax over (dst, label, count) rows: highest count,
    smallest label on ties — vectorized (lexsort + first-of-run)."""
    o = np.lexsort((lab, -c, d))
    d2 = d[o]
    first = np.ones(len(d2), dtype=bool)
    first[1:] = d2[1:] != d2[:-1]
    sel = o[first]
    return d[sel], lab[sel]


def _lpa_count_runs(
    d: np.ndarray, lab: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collapse (dst, label) message rows to (dst, label, count)."""
    o = np.lexsort((lab, d))
    ds_, ls_ = d[o], lab[o]
    new_run = np.ones(len(ds_), dtype=bool)
    new_run[1:] = (ds_[1:] != ds_[:-1]) | (ls_[1:] != ls_[:-1])
    starts = np.nonzero(new_run)[0]
    counts = np.diff(np.append(starts, len(ds_))).astype(np.int64)
    return ds_[starts], ls_[starts], counts


def _lpa_driver(src: np.ndarray, dst: np.ndarray, iters: int) -> pa.Table:
    """Driver-sized synchronous LPA over DISTINCT SYMMETRIC edges."""
    nodes = np.unique(np.concatenate([src, dst]))
    sidx = np.searchsorted(nodes, src)
    didx = np.searchsorted(nodes, dst)
    labels = nodes.astype(np.int64).copy()
    for _ in range(iters):
        rd, rl, rc = _lpa_count_runs(didx, labels[sidx])
        pd_, pl = _lpa_pick(rd, rl, rc)
        new_labels = labels.copy()
        new_labels[pd_] = pl
        labels = new_labels
    return pa.table(
        {
            "node": pa.array(nodes.astype(np.int64), pa.int64()),
            "community": pa.array(labels, pa.int64()),
        }
    )


LPA_DRIVER_MAX_EDGES = 2_000_000


def label_propagation(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    num_parts: int = 64,
    driver_max_edges: int | None = None,
) -> "ray.data.Dataset":
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) with a DETERMINISTIC update: every node simultaneously
    adopts the most frequent label among its neighbors' previous-round
    labels, smallest label on ties, for a FIXED number of rounds —
    integer labels and an exact tie-break make the result
    bit-reproducible at any partition count (the ``pagerank`` trick,
    without needing fixed-point arithmetic: everything is already an
    int64 count).

    Input is a directed edge Dataset; the graph is symmetrized and
    pair-deduplicated internally, so each neighbor votes exactly once
    per round.  Distributed shape per round: one co-partition hash
    join of the static symmetric edge list against the node-sized
    label table, per-batch (dst, label, n) partials, and one
    dst-partitioned merge that computes the per-node argmax — the
    corpus-scale edge list is joined, never collected; only the label
    table (one row per node) materializes between rounds.  Small
    graphs short-circuit to a vectorized driver kernel (same results,
    pinned by tests).
    """
    if driver_max_edges is None:
        driver_max_edges = LPA_DRIVER_MAX_EDGES
    edges = edges.materialize()
    n_edges = edges.count()
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "community": pa.array([], pa.int64()),
        }
    )
    if n_edges == 0:
        return ray.data.from_arrow(empty)
    if n_edges <= driver_max_edges:
        tbl = pa.concat_tables(
            ray.get(edges.to_arrow_refs()), promote_options="default"
        )
        a = tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        sym = np.unique(
            np.stack(
                [np.concatenate([a, b]), np.concatenate([b, a])], axis=1
            ),
            axis=0,
        )
        return ray.data.from_arrow(
            _lpa_driver(sym[:, 0], sym[:, 1], iters)
        )

    # ---- distributed path ----
    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[src_col].combine_chunks().cast(pa.int64())
        b = batch[dst_col].combine_chunks().cast(pa.int64())
        keep = pc.not_equal(a, b)
        a, b = a.filter(keep), b.filter(keep)
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    def pair_unique(g: pa.Table) -> pa.Table:
        # all rows of one src hash-part are co-located: pair dedup
        m = np.unique(
            np.stack(
                [
                    g["src"].to_numpy(zero_copy_only=False),
                    g["dst"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "src": pa.array(m[:, 0].astype(np.int64), pa.int64()),
                "dst": pa.array(m[:, 1].astype(np.int64), pa.int64()),
            }
        )

    e = _coarse_group_apply(
        edges.map_batches(symmetrize, batch_format="pyarrow"),
        "src",
        pair_unique,
        num_parts,
    ).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["src"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node": pa.array(u.astype(np.int64), pa.int64()),
                "community": pa.array(u.astype(np.int64), pa.int64()),
            }
        )

    def label_merge(g: pa.Table) -> pa.Table:
        u = np.unique(g["node"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node": pa.array(u.astype(np.int64), pa.int64()),
                "community": pa.array(u.astype(np.int64), pa.int64()),
            }
        )

    labels = _coarse_group_apply(
        e.map_batches(init_labels, batch_format="pyarrow"),
        "node",
        label_merge,
        num_parts,
    ).materialize()

    def msg_partial(batch: pa.Table) -> pa.Table:
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = (
            batch["community"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        rd, rl, rc = _lpa_count_runs(d, lab)
        return pa.table(
            {
                "dst": pa.array(rd.astype(np.int64), pa.int64()),
                "community": pa.array(rl, pa.int64()),
                "c": pa.array(rc, pa.int64()),
            }
        )

    def pick_merge(g: pa.Table) -> pa.Table:
        t = g.group_by(["dst", "community"]).aggregate([("c", "sum")])
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["community"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        pd_, pl = _lpa_pick(d, lab, c)
        return pa.table(
            {
                "node": pa.array(pd_, pa.int64()),
                "community": pa.array(pl, pa.int64()),
            }
        )

    for _ in range(iters):
        joined = hash_join(
            e,
            labels,
            left_key="src",
            right_key="node",
            num_parts=num_parts,
        )
        labels = _coarse_group_apply(
            joined.map_batches(msg_partial, batch_format="pyarrow"),
            "dst",
            pick_merge,
            num_parts,
        ).materialize()
    # same scrub as k_core: the per-round shuffles can emit
    # schema-less zero-row blocks that poison downstream concat
    labels = drop_empty_blocks(labels)
    if labels is None:
        return ray.data.from_arrow(empty)
    return labels
