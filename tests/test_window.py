"""Distributed LEAD/LAG and fixed-point PageRank."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray

from tests.conftest import SF_TINY


def _events_ds(sf_dir):
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
    )


def _duck_lead(sf_dir, kind="lead"):
    fn = "LEAD" if kind == "lead" else "LAG"
    return duckdb.sql(
        f"""
        SELECT event_id,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               user_id,
               {fn}(user_id) OVER (ORDER BY ts, event_id) AS x
        FROM '{sf_dir}/events.parquet'
        ORDER BY event_id
        """
    ).arrow()


@pytest.mark.parametrize("kind", ["lead", "lag"])
def test_lead_lag_matches_duckdb(ray_session, kind):
    from cex_crawler_ray.stages.window import lead_lag

    got = (
        lead_lag(_events_ds(SF_TINY), kind=kind)
        .sort("event_id")
        .to_pandas()
    )
    want = _duck_lead(SF_TINY, kind).to_pandas()
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["ts_us"].to_numpy() == want["ts_us"].to_numpy()).all()
    g = got[f"{kind}_user_id"].to_numpy()
    w = want["x"].to_numpy()
    assert ((g == w) | (np.isnan(g.astype(float)) & np.isnan(w.astype(float)))).all()


def test_lead_tiny_buckets_cross_boundaries(ray_session):
    """1-minute buckets force nearly every lead across a bucket edge."""
    from cex_crawler_ray.stages.window import lead_lag

    got = (
        lead_lag(_events_ds(SF_TINY), bucket_us=60_000_000)
        .sort("event_id")
        .to_pandas()
    )
    want = _duck_lead(SF_TINY).to_pandas()
    g = got["lead_user_id"].to_numpy()
    w = want["x"].to_numpy()
    assert ((g == w) | (np.isnan(g.astype(float)) & np.isnan(w.astype(float)))).all()


def _pr_reference(edges, iters=5, scale=10**12):
    src = np.array([a for a, _ in edges], dtype=np.int64)
    dst = np.array([b for _, b in edges], dtype=np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
    base = (15 * scale) // (100 * len(nodes))
    rank = np.full(len(nodes), scale // len(nodes), dtype=np.int64)
    for _ in range(iters):
        contrib = (85 * rank[si]) // (100 * outdeg[si])
        acc = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(acc, di, contrib)
        rank = base + acc
    return dict(zip(nodes.tolist(), rank.tolist()))


def _edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(4)


EDGES = [
    (1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1), (6, 1), (2, 1),
    (7, 8), (8, 7), (9, 7),
]


def test_pagerank_driver_matches_reference(ray_session):
    from cex_crawler_ray.stages.window import pagerank

    got = pagerank(_edges_ds(EDGES)).to_pandas()
    want = _pr_reference(EDGES)
    assert dict(zip(got["node"], got["pr_rank"])) == want


def test_pagerank_distributed_equals_driver(ray_session):
    from cex_crawler_ray.stages.window import pagerank

    drv = pagerank(_edges_ds(EDGES)).to_pandas().sort_values("node")
    dist = (
        pagerank(_edges_ds(EDGES), driver_max_edges=0, num_parts=8)
        .to_pandas()
        .sort_values("node")
    )
    assert (drv["node"].to_numpy() == dist["node"].to_numpy()).all()
    assert (drv["pr_rank"].to_numpy() == dist["pr_rank"].to_numpy()).all()


def test_pagerank_mass_conserved_bound(ray_session):
    from cex_crawler_ray.stages.window import pagerank, PR_SCALE

    got = pagerank(_edges_ds(EDGES)).to_pandas()
    assert (got["pr_rank"] > 0).all()
    assert got["pr_rank"].sum() <= PR_SCALE


def test_pagerank_empty(ray_session):
    from cex_crawler_ray.stages.window import pagerank

    got = pagerank(_edges_ds([])).to_pandas()
    assert len(got) == 0


def test_semi_anti_join_partition(ray_session):
    from cex_crawler_ray.stages.join import semi_anti_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "v": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            }
        )
    ).repartition(3)
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 2, 4, 9], pa.int64())})
    ).repartition(2)
    semi = semi_anti_join(left, right, "k", "rk").to_pandas()
    anti = semi_anti_join(left, right, "k", "rk", anti=True).to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert sorted(anti["k"]) == [1, 3, 5]
    assert sorted(semi["v"]) == ["b", "d"]
    assert semi["k"].dtype.kind in "iu"


def test_trailing_window_sum_peers_and_boundaries(ray_session):
    from cex_crawler_ray.stages.window import trailing_window_sum

    H = 3_600_000_000
    rows = [
        # (event_id, ts_us, user, cents)
        (1, 0, 7, 10),
        (2, H // 2, 7, 20),        # within 1h of e1
        (3, H, 7, 40),             # exactly 1h after e1 -> includes e1
        (4, 3 * H, 7, 80),         # alone
        (5, 3 * H, 7, 160),        # peer of e4: both see 240
        (6, 0, 9, 1),              # other user untouched
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "cents": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    ).repartition(3)
    got = (
        trailing_window_sum(ds)
        .to_pandas()
        .set_index("event_id")["trail_cents"]
        .to_dict()
    )
    assert got == {1: 10, 2: 30, 3: 70, 4: 240, 5: 240, 6: 1}


def test_rows_window_sum_hand_case(ray_session):
    """ROWS frame counts physical rows, not peers: equal timestamps
    still window separately (tiebreak by id)."""
    import pandas as pd

    from cex_crawler_ray.stages.window import rows_window_sum

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 7, 7],
            "ts": pd.to_datetime(
                ["2024-01-01"] * 2 + ["2024-01-02"] * 3
            ),
            "cents": [10, 20, 30, 40, 50],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    out = (
        rows_window_sum(ds, n_preceding=1)
        .to_pandas()
        .sort_values("event_id")["rows_cents"]
        .tolist()
    )
    assert out == [10, 30, 50, 70, 90]


def test_cume_dist_counts_ties(ray_session):
    """Peers (equal values) all see the full peer group in n_le."""
    import pandas as pd

    from cex_crawler_ray.stages.window import cume_dist_counts

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 10],
            "user_id": [7, 7, 7, 7, 8],
            "cents": [5, 5, 3, 9, 1],
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    out = (
        cume_dist_counts(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["n_le"].tolist() == [3, 3, 1, 4, 1]
    assert out["n_key"].tolist() == [4, 4, 4, 4, 1]


def test_global_row_number_negatives_and_ties(ray_session):
    """Negative values bucket-order correctly (floor division) and tied
    values break by id; result equals pandas rank over (v, id)."""
    import numpy as np
    import pandas as pd

    from cex_crawler_ray.stages.window import global_row_number

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "event_id": np.arange(2000),
            "cents": rng.integers(-5000, 5000, 2000),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        global_row_number(ds, bucket_width=128)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values(["cents", "event_id"]).reset_index()
    want["rn"] = np.arange(1, len(want) + 1)
    want = want.sort_values("event_id")["rn"].reset_index(drop=True)
    assert got["rn"].astype("int64").equals(want.astype("int64"))


def test_global_prefix_max_strict_and_cross_bucket(ray_session):
    """First row gets INT64_MIN (strictly-earlier semantics); a large
    value in an early bucket must propagate into later buckets that
    hash into the SAME partition without corrupting in-bucket prefixes."""
    import numpy as np
    import pandas as pd

    from cex_crawler_ray.stages.window import global_prefix_max

    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts_us": rng.integers(0, 10**9, n),
        }
    )
    # plant a global spike early so later buckets must inherit it
    df.loc[10, "ts_us"] = 5 * 10**9
    got = (
        global_prefix_max(
            ray.data.from_pandas(df).repartition(5),
            order_col="event_id",
            val_col="ts_us",
            bucket_width=64,
            num_parts=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = df.sort_values("event_id")["ts_us"].shift(1).cummax()
    want.iloc[0] = np.iinfo(np.int64).min
    assert got["prefix_max"].to_numpy(dtype=np.int64).tolist() == [
        int(x) for x in want.to_numpy()
    ]


def test_max_concurrency_hand_case(ray_session):
    """Intervals straddling bucket boundaries; touching intervals
    ([0,10) and [10,20)) must NOT count as concurrent; tiny buckets
    force the cross-bucket prefix path."""
    import pandas as pd

    import ray
    from cex_crawler_ray.stages.window import max_concurrency

    iv = pd.DataFrame(
        {
            "s_us": [0, 10, 5, 7, 100, 101, 102],
            "e_us": [10, 20, 9, 30, 200, 150, 103],
        }
    )
    out = max_concurrency(
        ray.data.from_pandas(iv).repartition(3),
        bucket_width=8,
        num_parts=4,
    ).to_pandas()
    # t in [7,9): {0-10, 5-9, 7-30} = 3;  t in [102,103): {100-200,
    # 101-150, 102-103} = 3; never 4
    assert out["max_concurrent"].iloc[0] == 3
    assert out["n_intervals"].iloc[0] == 7


def test_rows_window_median_segments(ray_session):
    """Windows truncate at each key's segment start; W=3 median over a
    hand-checkable sequence."""
    import pandas as pd

    from cex_crawler_ray.stages.window import rows_window_median

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 10, 11],
            "user_id": [7, 7, 7, 7, 9, 9],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
                 "2024-01-01", "2024-01-02"]
            ),
            "cents": [10, 30, 20, 100, 5, 7],
        }
    )
    out = (
        rows_window_median(
            ray.data.from_pandas(df).repartition(3),
            n_preceding=2,
            num_parts=4,
        )
        .to_pandas()
        .sort_values("event_id")
    )
    # u7: [10], [10,30], [10,30,20], [30,20,100] -> 10, 20, 20, 30
    # u9: [5], [5,7] -> 5, 6
    assert out["median_cents"].tolist() == [10.0, 20.0, 20.0, 30.0, 5.0, 6.0]


def test_decayed_window_sum_matches_bruteforce(ray_session):
    """Random keyed stream vs a per-row brute-force of the shifted-add
    definition (including segment truncation)."""
    import pandas as pd

    from cex_crawler_ray.stages.window import decayed_window_sum

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "cents": rng.integers(-500, 5000, n).astype(np.int64),
        }
    )
    n_terms = 16
    out = (
        decayed_window_sum(
            ray.data.from_pandas(df).repartition(5),
            n_terms=n_terms,
            num_parts=8,
        )
        .to_pandas()
        .set_index("event_id")["decayed_cents"]
    )
    srt = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    for uid, g in srt.groupby("user_id"):
        c = g["cents"].to_numpy()
        for i in range(len(g)):
            want = sum(
                int(c[i - j]) << (n_terms - 1 - j)
                for j in range(min(i + 1, n_terms))
            )
            assert out[g["event_id"].iloc[i]] == want


# ------------------------------------------------------------- SALSA
def _salsa_reference(edges, iters=3, scale=10**12):
    """Pure-python dict-loop SALSA: degree-normalized HITS with exact
    int floor divisions (the bit-level spec both engine paths and the
    SQL twin must hit)."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    odeg, ideg = {}, {}
    for a, b in edges:
        odeg[a] = odeg.get(a, 0) + 1
        ideg[b] = ideg.get(b, 0) + 1
    hub = {v: scale // n for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iters):
        auth = {v: 0 for v in nodes}
        for a, b in edges:
            auth[b] += hub[a] // odeg[a]
        hub = {v: 0 for v in nodes}
        for a, b in edges:
            hub[a] += auth[b] // ideg[b]
    return {v: (hub[v], auth[v]) for v in nodes}


def test_salsa_driver_matches_reference(ray_session):
    from cex_crawler_ray.stages.window import salsa_scores

    got = salsa_scores(_edges_ds(EDGES)).to_pandas()
    want = _salsa_reference(EDGES)
    assert {
        int(r.node): (int(r.hub_rank), int(r.auth_rank))
        for r in got.itertuples()
    } == want


def test_salsa_distributed_equals_driver(ray_session):
    from cex_crawler_ray.stages.window import salsa_scores

    drv = salsa_scores(_edges_ds(EDGES)).to_pandas().sort_values("node")
    dist = (
        salsa_scores(_edges_ds(EDGES), driver_max_edges=0, num_parts=8)
        .to_pandas()
        .sort_values("node")
    )
    for col in ("node", "hub_rank", "auth_rank"):
        assert (drv[col].to_numpy() == dist[col].to_numpy()).all()


def test_salsa_mass_conserved_bound(ray_session):
    # floor divisions only shed mass: each vector's total stays <= the
    # initial SCALE mass and scores are nonnegative
    from cex_crawler_ray.stages.window import PR_SCALE, salsa_scores

    got = salsa_scores(_edges_ds(EDGES)).to_pandas()
    assert (got["hub_rank"] >= 0).all() and (got["auth_rank"] >= 0).all()
    assert got["hub_rank"].sum() <= PR_SCALE
    assert got["auth_rank"].sum() <= PR_SCALE


def test_salsa_hub_vs_authority_separation(ray_session):
    # star: 1 -> {2,3,4}; node 1 is a pure hub (auth 0), leaves are
    # pure authorities (hub 0)
    from cex_crawler_ray.stages.window import salsa_scores

    got = salsa_scores(_edges_ds([(1, 2), (1, 3), (1, 4)])).to_pandas()
    by = {int(r.node): r for r in got.itertuples()}
    assert by[1].auth_rank == 0 and by[1].hub_rank > 0
    for leaf in (2, 3, 4):
        assert by[leaf].hub_rank == 0 and by[leaf].auth_rank > 0


def test_salsa_empty(ray_session):
    from cex_crawler_ray.stages.window import salsa_scores

    got = salsa_scores(_edges_ds([])).to_pandas()
    assert len(got) == 0
