"""Round-3 additions: CUBE, quantile_cont, NTILE, interval join,
group corr, set ops, FastSS edit-distance pairs."""

import numpy as np
import pyarrow as pa
import pytest

import ray


# ------------------------------------------------------------- ntile
@pytest.mark.parametrize("n_rows", [1, 2, 3, 4, 5, 7, 8, 9, 13])
def test_ntile_matches_duckdb_remainder_rule(ray_session, n_rows):
    import duckdb

    from cex_crawler_ray.stages.window import ntile

    tbl = pa.table(
        {
            "event_id": pa.array(range(n_rows), pa.int64()),
            "user_id": pa.array([1] * n_rows, pa.int64()),
            "ts": pa.array(
                np.arange(n_rows, dtype="int64"), pa.timestamp("us")
            ),
        }
    )
    got = (
        ntile(ray.data.from_arrow(tbl), n_tiles=4)
        .to_pandas()
        .sort_values("event_id")["tile"]
        .tolist()
    )
    want = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT NTILE(4) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) FROM tbl ORDER BY event_id"
        )
        .fetchall()
    ]
    assert got == want


def test_ntile_multi_user(ray_session):
    from cex_crawler_ray.stages.window import ntile

    rows = []
    for u in range(5):
        for i in range(u + 3):
            rows.append((u * 100 + i, u, i))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[2] for r in rows], "int64"),
                pa.timestamp("us"),
            ),
        }
    )
    got = ntile(ray.data.from_arrow(tbl), n_tiles=3).to_pandas()
    # every user's tiles are 1..min(3, n) and sizes differ by <= 1
    df = got.copy()
    df["user"] = df["event_id"] // 100
    for _, g in df.groupby("user"):
        sizes = g["tile"].value_counts()
        assert sizes.max() - sizes.min() <= 1
        assert set(sizes.index) == set(range(1, min(3, len(g)) + 1))


# ---------------------------------------------------- quantile_cont
@pytest.mark.parametrize("n", [4, 5, 7, 10, 997, 1000])
@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_quantile_cont_matches_duckdb(ray_session, n, q):
    import duckdb

    from cex_crawler_ray.stages.sketch import exact_global_quantile_cont

    rng = np.random.RandomState(n)
    vals = rng.randint(0, 1_000_000, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"cents": pa.array(vals)}))
    got = exact_global_quantile_cont(ds, col="cents", q=q)
    want = (
        duckdb.connect()
        .execute(f"SELECT quantile_cont(c, {q}) FROM (SELECT UNNEST(?) c)",
                 [vals.tolist()])
        .fetchone()[0]
    )
    assert got == pytest.approx(want, abs=1e-9)


# ------------------------------------------------------ interval join
def test_interval_join_bruteforce(ray_session):
    from cex_crawler_ray.stages.join import interval_join_broadcast

    rng = np.random.RandomState(3)
    n_ranges, n_events = 40, 500
    lo = rng.randint(0, 10_000, n_ranges).astype(np.int64)
    width = rng.randint(1, 3_000, n_ranges).astype(np.int64)
    hi = lo + width
    ranges = pa.table(
        {
            "range_id": pa.array(np.arange(n_ranges, dtype=np.int64)),
            "lo": pa.array(lo),
            "hi": pa.array(hi),
        }
    )
    ts = rng.randint(0, 13_000, n_events).astype(np.int64)
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts_us": pa.array(ts),
        }
    )
    got = interval_join_broadcast(
        ray.data.from_arrow(events).repartition(4), ranges
    ).to_pandas()
    got_set = set(zip(got["event_id"], got["range_id"]))
    want = {
        (e, r)
        for e in range(n_events)
        for r in range(n_ranges)
        if lo[r] <= ts[e] <= hi[r]
    }
    assert got_set == want
    assert len(got) == len(want)  # no duplicate emissions


# --------------------------------------------------------- group corr
def test_group_corr_matches_numpy(ray_session):
    from cex_crawler_ray.stages.stats import group_corr

    rng = np.random.RandomState(11)
    key = rng.randint(0, 3, 3000)
    x = rng.normal(size=3000)
    y = 0.3 * x + rng.normal(size=3000)
    tbl = pa.table(
        {
            "k": pa.array(key, pa.int64()),
            "x": pa.array(x),
            "y": pa.array(y),
        }
    )
    got = group_corr(
        ray.data.from_arrow(tbl).repartition(8), "k", "x", "y"
    ).to_pandas().set_index("k")["corr"]
    for g in range(3):
        m = key == g
        want = np.corrcoef(x[m], y[m])[0, 1]
        assert got.loc[g] == pytest.approx(want, abs=1e-9)


def test_group_corr_zero_variance_null(ray_session):
    from cex_crawler_ray.stages.stats import group_corr

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "x": pa.array([2.0, 2.0, 2.0]),
            "y": pa.array([1.0, 2.0, 3.0]),
        }
    )
    got = group_corr(ray.data.from_arrow(tbl), "k", "x", "y")
    assert np.isnan(got["corr"].to_numpy(zero_copy_only=False)[0])


# ------------------------------------------------------------- fuzzy
def test_edit1_within_kernel():
    from cex_crawler_ray.stages.fuzzy import edit1_within

    assert edit1_within("abc", "abc")
    assert edit1_within("abc", "abd")      # substitution
    assert edit1_within("abc", "abcd")     # insertion at end
    assert edit1_within("abc", "xabc")     # insertion at front
    assert edit1_within("abc", "ac")       # deletion
    assert not edit1_within("abc", "abXY")
    assert not edit1_within("abc", "xbd")
    assert not edit1_within("", "ab")
    assert edit1_within("", "a")


def test_edit1_pairs_bruteforce(ray_session):
    from cex_crawler_ray.stages.fuzzy import edit1_pairs, edit1_within

    vocab = [
        "cold plate", "old plate", "bold plate", "cold plates",
        "hot gear", "hot bear", "hot gears", "unrelated thing",
        "a", "b", "ab",
    ]
    # duplicate values across batches must not duplicate pairs
    vals = vocab * 3
    ds = ray.data.from_arrow(
        pa.table({"p_name": pa.array(vals, pa.string())})
    ).repartition(4)
    got = edit1_pairs(ds, "p_name").to_pandas()
    got_set = set(zip(got["val_a"], got["val_b"]))
    want = {
        (a, b)
        for i, a in enumerate(sorted(set(vocab)))
        for b in sorted(set(vocab))[i + 1 :]
        if a != b and edit1_within(a, b)
    }
    assert got_set == want
    assert len(got) == len(want)


# --------------------------------------------------------- triangles
def test_triangle_count_bruteforce(ray_session):
    from itertools import combinations

    from cex_crawler_ray.stages.graph import triangle_count

    rng = np.random.RandomState(5)
    n_nodes, n_edges = 30, 120
    src = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    got = triangle_count(
        ray.data.from_arrow(edges).repartition(5)
    )
    und = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert got == want and want > 0


def test_triangle_count_known_graph(ray_session):
    from cex_crawler_ray.stages.graph import triangle_count

    # two triangles sharing an edge + a pendant vertex: K4 minus one
    # edge has exactly 2 triangles
    src = np.array([1, 2, 1, 3, 2, 2, 4], np.int64)
    dst = np.array([2, 3, 3, 4, 4, 1, 5], np.int64)  # dup edge 1-2 too
    edges = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    assert triangle_count(ray.data.from_arrow(edges)) == 2


# ---------------------------------------------------------------- PQ
def test_knn_pq_recall_vs_bruteforce(ray_session):
    from cex_crawler_ray.stages.similarity import knn_brute_force, knn_pq

    sf = "/root/testdata/sf0.01"
    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    first = emb.take(3)
    q = np.stack([np.asarray(r["embedding"], np.float64) for r in first])
    exact = knn_brute_force(emb, q, k=10).to_pandas()
    approx = knn_pq(emb, q, k=10).to_pandas()
    for qi in range(3):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        assert len(a) == 10
        assert len(e & a) / 10 >= 0.8, (qi, len(e & a))


def test_pq_codes_are_m_bytes(ray_session):
    from cex_crawler_ray.stages.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    books = train_pq_codebooks(emb, m=4, ksub=16)
    assert books.shape[0] == 4 and books.shape[1] == 16
    codes = pq_encode(emb, books).take(5)
    for r in codes:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 16 for c in r["codes"])


# ---------------------------------------------------------- skew salting
def test_salted_group_distinct_hot_key(ray_session):
    """A 90%-hot key must still count exactly; values shared across
    batches must not double-count."""
    import pandas as pd

    from cex_crawler_ray.stages.skew import salted_group_distinct

    rng = np.random.default_rng(7)
    n = 20_000
    keys = np.where(rng.random(n) < 0.9, "hot", "cold")
    vals = rng.integers(0, 500, n)  # heavy repetition across batches
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        salted_group_distinct(ds, "k", "v")
        .to_pandas()
        .set_index("k")["n_distinct"]
        .to_dict()
    )
    want = df.groupby("k")["v"].nunique().to_dict()
    assert got == want


def test_salted_group_distinct_salt_count(ray_session):
    """Per-salt partials: each key contributes at most ``salts`` rows
    to the final sum exchange (the skew guarantee)."""
    import pandas as pd

    from cex_crawler_ray.stages.skew import salted_group_distinct

    df = pd.DataFrame({"k": ["a"] * 1000, "v": np.arange(1000)})
    ds = ray.data.from_pandas(df).repartition(4)
    out = salted_group_distinct(ds, "k", "v", salts=4).to_pandas()
    assert out["n_distinct"].tolist() == [1000]


# ---------------------------------------------------------------- kmeans
def test_kmeans_matches_numpy_reference(ray_session):
    """Fixed-point Lloyd must equal a single-process numpy run exactly,
    regardless of batching."""
    from cex_crawler_ray.stages.cluster import (
        _assign,
        _round_e6,
        kmeans_assign,
        kmeans_fit,
    )

    rng = np.random.default_rng(3)
    n, d, k = 400, 8, 3
    m = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(7)
    cent0 = m[:k].astype(np.float64)

    # numpy reference with the same fixed-point update
    cent = cent0.copy()
    x64 = m.astype(np.float64)
    for _ in range(4):
        a = _assign(x64, cent)
        e6 = _round_e6(x64)
        for c in range(k):
            mask = a == c
            if mask.any():
                cent[c] = e6[mask].sum(axis=0) / 1e6 / mask.sum()
    want = _assign(x64, cent)

    fitted = kmeans_fit(ds, cent0, iters=4)
    np.testing.assert_allclose(fitted, cent, rtol=0, atol=0)
    got = (
        kmeans_assign(ds, fitted)
        .to_pandas()
        .sort_values("vec_id")["cluster"]
        .to_numpy()
    )
    assert (got == want).all()


def test_kmeans_inertia_decreases(ray_session):
    from cex_crawler_ray.stages.cluster import (
        kmeans_fit,
        kmeans_inertia,
        seed_centroids,
    )

    sf = "/root/testdata/sf0.001"
    path = f"{sf}/embeddings.parquet"
    emb = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    c0 = seed_centroids(path, k=4)
    i0 = kmeans_inertia(emb, c0)
    c2 = kmeans_fit(emb, c0, iters=2)
    i2 = kmeans_inertia(emb, c2)
    assert i2 <= i0


# ------------------------------------------------------------- bigram LM
def test_bigram_logprob_hand_case(ray_session):
    """'a b a b' : c(a b)=2 (two docs x1), c(b a)=1... verify against a
    direct computation on a 3-doc corpus."""
    import math

    from cex_crawler_ray.stages.tfidf import bigram_logprob_scores

    docs = ["a b c", "a b", "c"]
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    out = (
        bigram_logprob_scores(ray.data.from_arrow(tbl).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # corpus: c(a)=2 c(b)=2 c(c)=2 ; c('a b')=2 c('b c')=1
    lp_ab = math.log(2 / 2)
    lp_bc = math.log(1 / 2)
    want0 = round((lp_ab + lp_bc) / 2 * 10000)
    want1 = round(lp_ab * 10000)
    assert list(out.index) == [0, 1]  # doc 2 has no bigrams
    assert out.loc[0, "logprob_e4"] == want0
    assert out.loc[0, "n_bigrams"] == 2
    assert out.loc[1, "logprob_e4"] == want1


# ---------------------------------------------------------------- zscore
def test_group_zscore_sums_to_zero(ray_session):
    """Within each group, z-scores sum to ~0 and std ~1."""
    import pandas as pd

    from cex_crawler_ray.stages.stats import group_zscore

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "id": np.arange(3000, dtype=np.int64),
            "g": rng.choice(["x", "y"], 3000),
            "v": rng.normal(10, 3, 3000),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    out = group_zscore(ds, "g", "v", "id").to_pandas()
    for g, grp in out.groupby("g"):
        z = grp["z_e2"].to_numpy() / 100.0
        assert abs(z.mean()) < 0.01
        assert abs(z.std() - 1.0) < 0.02


# -------------------------------------------------------------- semdedup
def test_semdedup_finds_injected_near_dups(ray_session):
    """A zero-first-dim copy must pair with its original when both land
    in the same cluster; keep-set drops exactly the b-sides."""
    from cex_crawler_ray.stages.cluster import (
        seed_centroids,
        semdedup_keep,
        semdedup_pairs,
    )
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    cent = seed_centroids(f"{sf}/embeddings.parquet", k=4)
    corpus = E._emb_near_corpus(sf)
    pairs = semdedup_pairs(corpus, cent, tau=0.95).to_pandas()
    assert len(pairs) > 0
    # every pair is (original, its shifted copy) at cos ~0.99
    assert (pairs["vec_id_b"] - pairs["vec_id_a"] == 1_000_000).all()
    assert (pairs["cos_e6"] >= 950_000).all()
    kept = semdedup_keep(corpus, cent, tau=0.95).to_pandas()
    dropped = set(pairs["vec_id_b"])
    assert dropped.isdisjoint(set(kept["vec_id"]))
    n_total = corpus.count()
    assert len(kept) == n_total - len(dropped)


# ------------------------------------------------------------ json field
def test_json_int_field_edge_cases(ray_session):
    from cex_crawler_ray.stages.stats import json_int_field

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "j": pa.array(
                [
                    '{"k": 42, "x": 1}',
                    '{"x": 7}',            # field absent -> null
                    '{"k": -5}',
                    '{"kk": 9, "k":  8}',  # no partial-key match
                ],
                pa.string(),
            ),
        }
    )
    out = (
        json_int_field(ray.data.from_arrow(tbl), "j", "k", "id", "k")
        .to_pandas()
        .set_index("id")["k"]
    )
    assert out[1] == 42 and out[3] == -5 and out[4] == 8
    assert out.isna()[2]


# ------------------------------------------------------------- skew join
def test_skew_join_equals_hash_join(ray_session):
    """A 70%-hot key corpus: skew_join's output row set must be
    identical to the plain co-partition hash_join (hot-key routing is
    not allowed to change the join semantics)."""
    import pandas as pd

    from cex_crawler_ray.stages.join import hash_join
    from cex_crawler_ray.stages.skew import skew_join

    rng = np.random.default_rng(11)
    n = 5_000
    keys = np.where(rng.random(n) < 0.7, 3, rng.integers(0, 200, n))
    left = pd.DataFrame({"k": keys.astype(np.int64), "x": np.arange(n)})
    right = pd.DataFrame(
        {"rk": np.arange(200, dtype=np.int64), "y": np.arange(200) * 10}
    )
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right).repartition(2)

    got = (
        skew_join(lds, rds, "k", "rk", hot_k=4, num_parts=8)
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)[["k", "x", "rk", "y"]]
    )
    want = (
        hash_join(lds, rds, "k", "rk", num_parts=8)
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)[["k", "x", "rk", "y"]]
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )
    # the hot key must actually be present and fully joined
    assert (got["k"] == 3).sum() == (keys == 3).sum()


def test_skew_join_no_hot_keys_degenerate(ray_session):
    """Uniform keys: whatever MG nominates, output equals the plain
    join; empty-hot-side plumbing must not break the union schema."""
    import pandas as pd

    from cex_crawler_ray.stages.join import hash_join
    from cex_crawler_ray.stages.skew import skew_join

    left = pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64), "x": np.arange(100)}
    )
    right = pd.DataFrame(
        {"rk": np.arange(0, 100, 2, dtype=np.int64), "y": np.arange(50)}
    )
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right)
    got = (
        skew_join(lds, rds, "k", "rk", hot_k=4, num_parts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)[["k", "x", "rk", "y"]]
    )
    want = (
        hash_join(lds, rds, "k", "rk", num_parts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)[["k", "x", "rk", "y"]]
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


# ------------------------------------------------------------ bloom join
def test_bloom_probe_rejects_absent_keys(ray_session):
    """The bitmap must accept every build key and reject almost all
    absent keys (false-positive rate well under the 2% design point)."""
    import pandas as pd

    from cex_crawler_ray.stages.join import (
        bloom_probe_mask,
        build_key_bloom,
    )

    present = np.arange(0, 50_000, 2, dtype=np.int64)  # 25k even keys
    ds = ray.data.from_pandas(pd.DataFrame({"k": present})).repartition(4)
    bm = build_key_bloom(ds, "k", n_bits=1 << 20, k=4)
    assert bloom_probe_mask(present, bm, 1 << 20, 4).all()
    absent = np.arange(1, 50_000, 2, dtype=np.int64)
    fp = bloom_probe_mask(absent, bm, 1 << 20, 4).mean()
    assert fp < 0.02, fp


def test_bloom_join_equals_hash_join(ray_session):
    """Bloom prefilter is reduction only: output must equal the plain
    co-partition join bit for bit."""
    import pandas as pd

    from cex_crawler_ray.stages.join import bloom_join, hash_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 10_000, 20_000).astype(np.int64),
            "x": np.arange(20_000),
        }
    )
    right = pd.DataFrame(
        {"rk": np.arange(0, 10_000, 100, dtype=np.int64), "y": np.arange(100)}
    )  # 1% selective
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right)
    got = (
        bloom_join(lds, rds, "k", "rk", num_parts=8)
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)[["k", "x", "rk", "y"]]
    )
    want = (
        hash_join(lds, rds, "k", "rk", num_parts=8)
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)[["k", "x", "rk", "y"]]
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


# -------------------------------------------------------------- profiler
def test_profile_table_nulls_and_types(ray_session):
    """Nulls excluded from min/max/distinct but counted; int min/max
    numeric (10 > 9 despite '10' < '9'); batching-invariant."""
    import pandas as pd

    from cex_crawler_ray.stages.profile import profile_table

    tbl = pa.table(
        {
            "a": pa.array([1, 9, 10, None, 2, 10], pa.int64()),
            "s": pa.array(["b", None, "a", "c", "a", None], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = profile_table(ds, ["a", "s"]).set_index("col_name")
    assert out.loc["a", "n_rows"] == 6
    assert out.loc["a", "n_nulls"] == 1
    assert out.loc["a", "n_distinct"] == 4
    assert out.loc["a", "min_val"] == "1"
    assert out.loc["a", "max_val"] == "10"
    assert out.loc["s", "n_nulls"] == 2
    assert out.loc["s", "n_distinct"] == 3
    assert out.loc["s", "min_val"] == "a"
    assert out.loc["s", "max_val"] == "c"
