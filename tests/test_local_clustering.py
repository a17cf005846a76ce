"""Per-node triangle membership vs brute force + sum identity."""

from itertools import combinations

import numpy as np
import pandas as pd

import ray


def _brute(edges):
    adj = {}
    es = set()
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        if (a, b) in es:
            continue
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b in es:
        common = adj[a] & adj[b]
        for c in common:
            if c > b:  # count each triangle once at its max vertex
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return {
        n: (len(adj[n]), tri[n]) for n in adj if len(adj[n]) >= 2
    }


def test_local_clustering_matches_brute_force(ray_session):
    from cex_crawler_ray.stages.graph import local_clustering, triangle_count

    rng = np.random.RandomState(17)
    edges = [
        (int(rng.randint(0, 40)), int(rng.randint(0, 40)))
        for _ in range(350)
    ]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    want = _brute(edges)
    for parts in (2, 7):
        out = local_clustering(
            ray.data.from_pandas(df).repartition(parts), num_parts=8
        ).to_pandas()
        got = {
            int(r.node): (int(r.degree), int(r.n_triangles))
            for r in out.itertuples()
        }
        assert got == want, parts

    # identity: per-node memberships sum to 3x the global count
    total = triangle_count(ray.data.from_pandas(df), num_parts=8)
    assert sum(t for _, t in want.values()) == 3 * total
