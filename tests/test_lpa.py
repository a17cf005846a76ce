"""Label-propagation community detection: brute-force reference
equality on a deterministic random graph, driver-vs-distributed path
equality, and structural sanity (planted cliques collapse to one
label).  Catalog-level oracle parity runs in the whole-catalog sweep
(``tests/test_oracle_parity.py``)."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_lpa(edges, iters):
    """Dict-based synchronous LPA: mode of neighbor labels, tie min."""
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    labels = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n, ns in nbrs.items():
            counts = {}
            for m in ns:
                l = labels[m]
                counts[l] = counts.get(l, 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best[0]
        labels = new
    return labels


def _rand_edges(n_nodes, n_edges, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    return list(zip(a.tolist(), b.tolist()))


def _to_ds(edges):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("iters", [1, 3, 4])
def test_lpa_matches_reference(ray_session, iters):
    from cex_crawler_ray.stages.graph import label_propagation

    edges = _rand_edges(60, 200, seed=7)
    expected = _brute_lpa(edges, iters)
    got = label_propagation(_to_ds(edges), iters=iters).to_pandas()
    got_map = dict(zip(got["node"], got["community"]))
    assert got_map == expected


def test_lpa_distributed_equals_driver(ray_session):
    from cex_crawler_ray.stages.graph import label_propagation

    edges = _rand_edges(80, 400, seed=11)
    drv = (
        label_propagation(_to_ds(edges), iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        label_propagation(
            _to_ds(edges), iters=3, driver_max_edges=0, num_parts=8
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert drv.equals(dist)


def test_lpa_planted_cliques(ray_session):
    from cex_crawler_ray.stages.graph import label_propagation

    # two 6-cliques joined by a single bridge edge: after a few rounds
    # each clique is one community (min member id), and the two
    # communities stay distinct
    c1 = [(a, b) for a in range(6) for b in range(6) if a < b]
    c2 = [
        (a, b) for a in range(10, 16) for b in range(10, 16) if a < b
    ]
    edges = c1 + c2 + [(5, 10)]
    got = label_propagation(_to_ds(edges), iters=6).to_pandas()
    lab = dict(zip(got["node"], got["community"]))
    assert len({lab[n] for n in range(6)}) == 1
    assert len({lab[n] for n in range(10, 16)}) == 1
    assert lab[0] != lab[12]


def test_lpa_empty_and_self_loops(ray_session):
    from cex_crawler_ray.stages.graph import label_propagation

    empty = label_propagation(_to_ds([]), iters=3)
    assert empty.count() == 0
    # (Dataset.to_pandas drops columns on zero rows; check the schema)
    assert empty.schema().names == ["node", "community"]
    # self-loop-only nodes drop out entirely
    got = label_propagation(
        _to_ds([(1, 1), (2, 3)]), iters=2
    ).to_pandas()
    assert set(got["node"]) == {2, 3}


def test_drop_empty_blocks_scrubs_schemaless(ray_session):
    """A zero-row schema-less block from a shuffle must not poison
    downstream concat: drop_empty_blocks removes it metadata-only."""
    import ray

    from cex_crawler_ray.stages.graph import drop_empty_blocks

    empty = pa.table({})
    real = pa.table({"node": pa.array([1, 2], pa.int64())})
    ds = ray.data.from_arrow_refs(
        [ray.put(empty), ray.put(real)]
    ).materialize()
    clean = drop_empty_blocks(ds)
    df = clean.to_pandas()
    assert list(df.columns) == ["node"] and len(df) == 2
    all_empty = ray.data.from_arrow_refs([ray.put(empty)]).materialize()
    assert drop_empty_blocks(all_empty) is None
