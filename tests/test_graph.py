"""Connected components + keep-best cluster dedup."""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _cc_reference(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Tiny union-find for ground truth."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(pairs: list[tuple[int, int]]) -> dict[int, int]:
    from cex_crawler_ray.stages.graph import connected_components

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    out = connected_components(ds, num_parts=8).to_pandas()
    return dict(zip(out["node"], out["cluster_id"]))


def test_cc_chain_and_islands(ray_session):
    pairs = [(1, 2), (2, 3), (4, 5), (10, 3)]
    assert _run_cc(pairs) == _cc_reference(pairs)


def test_cc_long_chain_needs_iterations(ray_session):
    # a 12-node path graph: worst case for label propagation (diameter
    # iterations); exercises the convergence loop, not just one round
    pairs = [(i, i + 1) for i in range(100, 112)]
    got = _run_cc(pairs)
    assert got == _cc_reference(pairs)
    assert set(got.values()) == {100}


def test_cc_distributed_path_equals_driver_path(ray_session):
    # force the min-label loop (driver_max_pairs=0) on a chain — the
    # diameter-bound worst case — and pin it to the union-find result
    from cex_crawler_ray.stages.graph import connected_components

    pairs = [(i, i + 1) for i in range(200, 206)] + [(300, 301)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], pa.int64()),
                "id_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    out = connected_components(
        ds, num_parts=8, driver_max_pairs=0
    ).to_pandas()
    got = dict(zip(out["node"], out["cluster_id"]))
    assert got == _cc_reference(pairs)


def test_cc_random_vs_union_find(ray_session):
    rng = np.random.RandomState(7)
    pairs = [
        (int(a), int(b))
        for a, b in rng.randint(0, 60, size=(80, 2))
        if a != b
    ]
    assert _run_cc(pairs) == _cc_reference(pairs)


def test_cc_empty(ray_session):
    from cex_crawler_ray.stages.graph import connected_components

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
    )
    out = connected_components(ds)
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "cluster_id"}


def test_keep_best_longest_wins(ray_session):
    from cex_crawler_ray.stages.graph import (
        connected_components,
        dedup_keep_best,
    )

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    ["aa", "aaaa", "aaa", "solo", "xy"], pa.string()
                ),
            }
        )
    )
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 2], pa.int64()),
                "id_b": pa.array([2, 3], pa.int64()),
            }
        )
    )
    cc = connected_components(pairs, num_parts=8)
    out = (
        dedup_keep_best(corpus, cc, num_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # cluster {1,2,3}: doc 2 has the longest text; 4 and 5 are singletons
    assert out["doc_id"].tolist() == [2, 4, 5]
    assert out["cluster_size"].tolist() == [3, 1, 1]


def test_keep_best_tie_breaks_to_min_id(ray_session):
    from cex_crawler_ray.stages.graph import (
        connected_components,
        dedup_keep_best,
    )

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7, 8], pa.int64()),
                "text": pa.array(["same", "same"], pa.string()),
            }
        )
    )
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([7], pa.int64()),
                "id_b": pa.array([8], pa.int64()),
            }
        )
    )
    cc = connected_components(pairs, num_parts=8)
    out = dedup_keep_best(corpus, cc, num_parts=8).to_pandas()
    assert out["doc_id"].tolist() == [7]
    assert out["cluster_size"].tolist() == [2]


# ----------------------------------- harmonic centrality / HyperBall
def _hc_edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(3)


def _hc_reference(edges, max_hops=6, scale=10**9):
    """Per-source dict BFS ground truth: (hc per node, ball per node)."""
    from collections import defaultdict

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    hc = {v: 0 for v in nodes}
    ball = {v: 1 for v in nodes}
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        for t in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = t
                        nxt.append(w)
            frontier = nxt
        for v, d in dist.items():
            if 1 <= d <= max_hops:
                hc[v] += scale // d
                ball[v] += 1
    return hc, ball


_HC_EDGES = [
    (1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1), (6, 1), (2, 1),
    (7, 8), (8, 7), (9, 7),
]


def test_harmonic_driver_matches_reference(ray_session):
    from cex_crawler_ray.stages.graph import harmonic_centrality

    got = harmonic_centrality(_hc_edges_ds(_HC_EDGES)).to_pandas()
    want, _ = _hc_reference(_HC_EDGES)
    assert dict(zip(got["node"], got["hc_rank"])) == want


def test_harmonic_distributed_equals_driver(ray_session):
    from cex_crawler_ray.stages.graph import harmonic_centrality

    rng = np.random.RandomState(11)
    edges = list(
        {
            (int(a), int(b))
            for a, b in rng.randint(0, 40, size=(120, 2))
            if a != b
        }
    )
    drv = (
        harmonic_centrality(_hc_edges_ds(edges))
        .to_pandas()
        .sort_values("node")
    )
    dist = (
        harmonic_centrality(
            _hc_edges_ds(edges), driver_max_edges=0, num_parts=8
        )
        .to_pandas()
        .sort_values("node")
    )
    assert (drv["node"].to_numpy() == dist["node"].to_numpy()).all()
    assert (drv["hc_rank"].to_numpy() == dist["hc_rank"].to_numpy()).all()
    want, _ = _hc_reference(edges)
    assert dict(zip(drv["node"], drv["hc_rank"])) == want


def test_harmonic_hop_bound_respected(ray_session):
    # a 9-node path: only the 6 nearest predecessors credit each node
    from cex_crawler_ray.stages.graph import harmonic_centrality

    edges = [(i, i + 1) for i in range(9)]
    got = harmonic_centrality(_hc_edges_ds(edges), max_hops=6).to_pandas()
    by = dict(zip(got["node"], got["hc_rank"]))
    scale = 10**9
    assert by[9] == sum(scale // d for d in range(1, 7))  # not 9 terms
    assert by[0] == 0


def test_ball_sizes_both_paths(ray_session):
    from cex_crawler_ray.stages.graph import ball_sizes_exact

    _, want = _hc_reference(_HC_EDGES)
    for kw in ({}, {"driver_max_edges": 0, "num_parts": 8}):
        got = ball_sizes_exact(_hc_edges_ds(_HC_EDGES), **kw).to_pandas()
        assert dict(zip(got["node"], got["ball"])) == want


def test_hyperball_distributed_equals_driver_bitwise(ray_session):
    from cex_crawler_ray.stages.graph import hyperball_harmonic

    rng = np.random.RandomState(3)
    edges = list(
        {
            (int(a), int(b))
            for a, b in rng.randint(0, 50, size=(160, 2))
            if a != b
        }
    )
    drv = (
        hyperball_harmonic(_hc_edges_ds(edges))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        hyperball_harmonic(
            _hc_edges_ds(edges), driver_max_edges=0, num_parts=8
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert (drv["node"] == dist["node"]).all()
    # deterministic hash + order-independent register max -> bitwise
    assert (drv["ball_est"].to_numpy() == dist["ball_est"].to_numpy()).all()
    assert (drv["hc_est"].to_numpy() == dist["hc_est"].to_numpy()).all()


def test_hyperball_accuracy_vs_exact(ray_session):
    from cex_crawler_ray.stages.graph import hyperball_harmonic

    rng = np.random.RandomState(5)
    edges = list(
        {
            (int(a), int(b))
            for a, b in rng.randint(0, 80, size=(300, 2))
            if a != b
        }
    )
    hc_want, ball_want = _hc_reference(edges)
    got = hyperball_harmonic(_hc_edges_ds(edges)).to_pandas()
    for r in got.itertuples():
        assert abs(r.ball_est / ball_want[int(r.node)] - 1.0) <= 0.12
        want = hc_want[int(r.node)] / 1e9
        if want > 0:
            assert abs(r.hc_est / want - 1.0) <= 0.15
        else:
            assert r.hc_est <= 0.05


def test_harmonic_empty(ray_session):
    from cex_crawler_ray.stages.graph import (
        ball_sizes_exact,
        harmonic_centrality,
        hyperball_harmonic,
    )

    for fn in (harmonic_centrality, ball_sizes_exact, hyperball_harmonic):
        assert fn(_hc_edges_ds([])).count() == 0


# ------------------------------------------------------------- k-core
def _kcore_reference(edges, k):
    """Brute-force peel over an undirected edge set."""
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    while True:
        deg = {}
        for a, _ in und:
            deg[a] = deg.get(a, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        if len(alive) == len(deg):
            break
        und = {(a, b) for a, b in und if a in alive and b in alive}
        if not und:
            return {}
    return deg


def _run_kcore(edges, k, **kw):
    from cex_crawler_ray.stages.graph import k_core

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    out = k_core(ds, k=k, **kw).to_pandas()
    if out.empty:  # ray to_pandas drops columns on an empty dataset
        return {}
    return dict(zip(out["node"], out["deg"]))


def test_kcore_peels_tail(ray_session):
    # triangle 1-2-3 plus a pendant chain 3-4-5: 2-core is the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _run_kcore(edges, 2) == {1: 2, 2: 2, 3: 2}
    assert _run_kcore(edges, 2) == _kcore_reference(edges, 2)


def test_kcore_cascade_needs_iterations(ray_session):
    # long chain: 2-core peels one leaf per round from each end
    edges = [(i, i + 1) for i in range(12)]
    assert _run_kcore(edges, 2, max_iters=12) == {}


def test_kcore_keeps_whole_graph_when_k_low(ray_session):
    edges = [(1, 2), (2, 3), (1, 3)]
    assert _run_kcore(edges, 1) == {1: 2, 2: 2, 3: 2}


def test_kcore_random_vs_reference(ray_session):
    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 40, size=(150, 2))
        if a != b
    ]
    for k in (2, 3, 4):
        assert _run_kcore(edges, k) == _kcore_reference(edges, k)


def test_kcore_semijoin_path_equals_broadcast(ray_session):
    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 30, size=(120, 2))
        if a != b
    ]
    bcast = _run_kcore(edges, 3)
    semij = _run_kcore(edges, 3, broadcast_max_nodes=0)
    assert bcast == semij == _kcore_reference(edges, 3)
