"""Unit tests: BFS levels, sequence pattern, co-purchase pairs, OHLC."""

import numpy as np
import pandas as pd
import pytest

import ray


def test_bfs_levels_path_graph(ray_session):
    """Path 0-1-2-...-9 with seed 0: level == node index, capped at 6."""
    from cex_crawler_ray.stages.graph import bfs_levels

    src = list(range(9))
    dst = list(range(1, 10))
    edges = pd.DataFrame(
        {"src": src + dst, "dst": dst + src}  # undirected
    )
    seeds = pd.DataFrame({"node": [0]})
    out = (
        bfs_levels(
            ray.data.from_pandas(edges).repartition(3),
            ray.data.from_pandas(seeds),
            max_hops=6,
            num_parts=4,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # nodes 7..9 are beyond 6 hops -> absent
    assert out["node"].tolist() == list(range(7))
    assert out["level"].tolist() == list(range(7))


def test_bfs_levels_shorter_path_wins(ray_session):
    """Two routes to node 3 (0-1-2-3 and 0-3): min level wins."""
    from cex_crawler_ray.stages.graph import bfs_levels

    e = [(0, 1), (1, 2), (2, 3), (0, 3)]
    edges = pd.DataFrame(
        {
            "src": [a for a, b in e] + [b for a, b in e],
            "dst": [b for a, b in e] + [a for a, b in e],
        }
    )
    out = (
        bfs_levels(
            ray.data.from_pandas(edges),
            ray.data.from_pandas(pd.DataFrame({"node": [0]})),
            max_hops=6,
            num_parts=4,
        )
        .to_pandas()
        .set_index("node")["level"]
    )
    assert out[3] == 1 and out[2] == 2


def test_sequence_pattern_order_and_match(ray_session):
    from cex_crawler_ray.stages.sequence import sequence_pattern

    t = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2],
            "event_id": [1, 2, 3, 4, 5, 6],
            "event_type": [
                "view", "click", "purchase",      # vcp -> matches v c* p
                "purchase", "click", "view",      # pcv -> no
            ],
            "ts": [t, t + s, t + 2 * s] * 2,
        }
    )
    out = sequence_pattern(
        ray.data.from_pandas(df).repartition(2),
        pattern="vc*p",
        type_map={"view": "v", "click": "c", "purchase": "p"},
        num_parts=4,
    ).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert out["seq_len"].tolist() == [3]


def test_copurchase_pairs_support(ray_session):
    from cex_crawler_ray.stages.sequence import copurchase_pairs

    li = pd.DataFrame(
        {
            # order 1: {10, 20, 30}; order 2: {10, 20}; order 3: {10, 20}
            # (10,20) support 3; (10,30)/(20,30) support 1; dup row ignored
            "l_orderkey": [1, 1, 1, 1, 2, 2, 3, 3],
            "l_partkey": [10, 20, 30, 10, 10, 20, 20, 10],
        }
    )
    out = (
        copurchase_pairs(
            ray.data.from_pandas(li).repartition(3),
            min_support=2,
            num_parts=4,
        )
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [[10, 20, 3]]


def test_ohlc_merge_across_batches(ray_session):
    """Partials from different batches must re-pick open/close by the
    (ts, id) order key, not batch order."""
    from cex_crawler_ray.stages.stats import ohlc_daily

    df = pd.DataFrame(
        {
            "day": ["d1"] * 4,
            "event_type": ["x"] * 4,
            # rows deliberately out of time order across partitions
            "ts_us": [30, 10, 40, 20],
            "event_id": [3, 1, 4, 2],
            "cents": [300, 100, 400, 200],
        }
    )
    out = ohlc_daily(
        ray.data.from_pandas(df).repartition(4)
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["open_cents"], r["close_cents"]) == (100, 400)
    assert (r["high_cents"], r["low_cents"], r["n"]) == (400, 100, 4)


def test_bfs_driver_equals_distributed(ray_session):
    """The driver CSR fast path and the distributed min-reduce loop
    must produce identical levels on a random graph."""
    from cex_crawler_ray.stages.graph import bfs_levels

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 300)
    b = rng.integers(0, 60, 300)
    keep = a != b
    edges = pd.DataFrame(
        {
            "src": np.concatenate([a[keep], b[keep]]),
            "dst": np.concatenate([b[keep], a[keep]]),
        }
    )
    seeds = pd.DataFrame({"node": [0, 7]})

    def run(thresh):
        return (
            bfs_levels(
                ray.data.from_pandas(edges).repartition(3),
                ray.data.from_pandas(seeds),
                max_hops=4,
                num_parts=4,
                driver_max_edges=thresh,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    fast = run(10**6)
    dist = run(0)
    pd.testing.assert_frame_equal(
        fast.astype("int64"), dist.astype("int64")
    )


def test_sssp_weighted_path(ray_session):
    """Weighted diamond: 0-1 (w=1), 1-3 (w=1), 0-2 (w=5), 2-3 (w=1);
    shortest 0->3 is 2 via node 1 even though 0-2-3 has fewer max-w."""
    from cex_crawler_ray.stages.graph import sssp_dists

    e = [(0, 1, 1), (1, 3, 1), (0, 2, 5), (2, 3, 1)]
    edges = pd.DataFrame(
        {
            "src": [a for a, b, w in e] + [b for a, b, w in e],
            "dst": [b for a, b, w in e] + [a for a, b, w in e],
            "w": [w for a, b, w in e] * 2,
        }
    )
    out = (
        sssp_dists(
            ray.data.from_pandas(edges),
            ray.data.from_pandas(pd.DataFrame({"node": [0]})),
            max_rounds=6,
            num_parts=4,
        )
        .to_pandas()
        .set_index("node")["dist"]
    )
    assert out[0] == 0 and out[1] == 1 and out[3] == 2 and out[2] == 3


def test_sssp_round_bound(ray_session):
    """A 4-edge path with seed at one end: max_rounds=2 reaches only
    two hops out, and distances are the 2-sweep Bellman-Ford answer."""
    from cex_crawler_ray.stages.graph import sssp_dists

    edges = pd.DataFrame(
        {
            "src": [0, 1, 2, 3] + [1, 2, 3, 4],
            "dst": [1, 2, 3, 4] + [0, 1, 2, 3],
            "w": [2, 2, 2, 2] * 2,
        }
    )
    out = (
        sssp_dists(
            ray.data.from_pandas(edges),
            ray.data.from_pandas(pd.DataFrame({"node": [0]})),
            max_rounds=2,
            num_parts=4,
        )
        .to_pandas()
        .set_index("node")["dist"]
    )
    assert out.to_dict() == {0: 0, 1: 2, 2: 4}


def test_sssp_driver_equals_distributed(ray_session):
    """Driver Bellman-Ford fast path == distributed min-reduce loop
    on a random weighted graph, including an isolated seed."""
    from cex_crawler_ray.stages.graph import sssp_dists

    rng = np.random.default_rng(13)
    a = rng.integers(0, 60, 300)
    b = rng.integers(0, 60, 300)
    keep = a != b
    w = rng.integers(1, 10, keep.sum())
    edges = pd.DataFrame(
        {
            "src": np.concatenate([a[keep], b[keep]]),
            "dst": np.concatenate([b[keep], a[keep]]),
            "w": np.concatenate([w, w]),
        }
    )
    seeds = pd.DataFrame({"node": [0, 7, 1000]})  # 1000 isolated

    def run(thresh):
        return (
            sssp_dists(
                ray.data.from_pandas(edges).repartition(3),
                ray.data.from_pandas(seeds),
                max_rounds=5,
                num_parts=4,
                driver_max_edges=thresh,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    fast = run(10**6)
    dist = run(0)
    pd.testing.assert_frame_equal(
        fast.astype("int64"), dist.astype("int64")
    )
    assert (fast.loc[fast["node"] == 1000, "dist"] == 0).all()


def test_pointer_jump_chain(ray_session):
    """A 9-deep chain resolves with correct depths in log rounds."""
    from cex_crawler_ray.stages.graph import pointer_jump_roots

    nodes = list(range(10))
    parents = pd.DataFrame(
        {"node": nodes, "parent": [0] + nodes[:-1]}  # 0 is root
    )
    out = (
        pointer_jump_roots(
            ray.data.from_pandas(parents).repartition(3), num_parts=4
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out["root"].tolist() == [0] * 10
    assert out["depth"].tolist() == list(range(10))


def test_pointer_jump_forest_driver_equals_distributed(ray_session):
    """Multi-root forest: driver index-chasing == distributed doubling."""
    from cex_crawler_ray.stages.graph import pointer_jump_roots

    rng = np.random.default_rng(17)
    n = 300
    node = np.arange(n, dtype=np.int64)
    # roots: 0..4 self-parented; others attach to any smaller node
    parent = np.where(
        node < 5, node, rng.integers(0, np.maximum(node, 1))
    ).astype(np.int64)
    parents = pd.DataFrame({"node": node, "parent": parent})

    def run(thresh):
        return (
            pointer_jump_roots(
                ray.data.from_pandas(parents).repartition(3),
                num_parts=4,
                driver_max_nodes=thresh,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    fast = run(10**6)
    dist = run(0)
    pd.testing.assert_frame_equal(
        fast.astype("int64"), dist.astype("int64")
    )
    # spot-check exact semantics against a python walk
    import collections

    pmap = dict(zip(node.tolist(), parent.tolist()))
    for k in [0, 7, 123, 299]:
        cur, d = k, 0
        while pmap[cur] != cur:
            cur, d = pmap[cur], d + 1
        row = fast[fast["node"] == k].iloc[0]
        assert (row["root"], row["depth"]) == (cur, d)


def test_random_walks_deterministic_and_paths_equal(ray_session):
    """Walks replay a hand-computed pick sequence; driver CSR chase ==
    distributed two-join loop; duplicate edges don't shift ranks."""
    from cex_crawler_ray.stages.graph import _rw_pick, random_walks

    edges = pd.DataFrame(
        {
            "src": [0, 0, 0, 1, 1, 2, 3, 0],
            "dst": [1, 2, 3, 0, 2, 0, 0, 1],  # last row duplicates 0->1
        }
    )
    seeds = pd.DataFrame({"node": [0, 0, 5]})  # 5 isolated, 0 dup

    def run(thresh):
        return (
            random_walks(
                ray.data.from_pandas(edges).repartition(3),
                ray.data.from_pandas(seeds).repartition(2),
                length=4,
                num_parts=4,
                driver_max_edges=thresh,
            )
            .to_pandas()
            .sort_values(["seed", "step"])
            .reset_index(drop=True)
        )

    fast = run(10**6)
    dist = run(0)
    pd.testing.assert_frame_equal(
        fast.astype("int64"), dist.astype("int64")
    )
    # seed 5 has no out-edges: only its step-0 row
    assert (fast[fast["seed"] == 5]["step"] == 0).all()
    # replay seed 0 by hand over DISTINCT (src, dst) ranks
    adj = {0: [1, 2, 3], 1: [0, 2], 2: [0], 3: [0]}
    cur, walk = 0, [0]
    for k in range(1, 5):
        nb = adj[cur]
        cur = nb[_rw_pick(0, k, cur) % len(nb)]
        walk.append(cur)
    got = fast[fast["seed"] == 0].sort_values("step")["node"].tolist()
    assert got == walk


def test_neighborhood_agg_hand_graph(ray_session):
    """Path 1-2-3 with features f=(10,20,30): s1/s2 match hand sums,
    duplicate edges collapse, isolated node 9 gets zeros."""
    from cex_crawler_ray.stages.graph import neighborhood_agg

    edges = pd.DataFrame(
        {
            "src": [1, 2, 2, 3, 1],
            "dst": [2, 1, 3, 2, 2],  # (1,2) duplicated
        }
    )
    feats = pd.DataFrame(
        {"node": [1, 2, 3, 9], "f": [10, 20, 30, 99]}
    )
    def run(thresh):
        return (
            neighborhood_agg(
                ray.data.from_pandas(edges).repartition(2),
                ray.data.from_pandas(feats).repartition(2),
                hops=2,
                num_parts=4,
                driver_max_edges=thresh,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    out = run(10**6)
    dist = run(0)
    pd.testing.assert_frame_equal(
        out.astype("int64"), dist.astype("int64")
    )
    # s1: n1=f2=20, n2=f1+f3=40, n3=f2=20, n9=0
    # s2: n1=s1(2)=40, n2=s1(1)+s1(3)=40, n3=s1(2)=40, n9=0
    assert out["node"].tolist() == [1, 2, 3, 9]
    assert out["f"].tolist() == [10, 20, 30, 99]
    assert out["s1"].tolist() == [20, 40, 20, 0]
    assert out["s2"].tolist() == [40, 40, 40, 0]
