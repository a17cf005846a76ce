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
