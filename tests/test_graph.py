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
