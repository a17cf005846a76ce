"""HyperLogLog sketch: accuracy, mergeability, determinism."""

import numpy as np
import pytest

import ray

from cex_crawler_ray.stages.sketch import HyperLogLog, approx_distinct


def _hashes(n, seed=0):
    # full 64-bit hashes (a 63-bit generator leaves the top register
    # half unreachable and wrecks the estimate)
    rng = np.random.RandomState(seed)
    hi = rng.randint(0, 2**32, size=n, dtype=np.int64).astype(np.uint64)
    lo = rng.randint(0, 2**32, size=n, dtype=np.int64).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


@pytest.mark.parametrize("true_n", [100, 5_000, 100_000])
def test_hll_accuracy(true_n):
    h = HyperLogLog(p=12)
    h.add_hashes(_hashes(true_n))
    est = h.estimate()
    # standard error ~1.04/sqrt(4096) ≈ 1.6%; allow 6%
    assert abs(est - true_n) / true_n < 0.06


def test_hll_merge_equals_union():
    a_h, b_h = _hashes(10_000, seed=1), _hashes(10_000, seed=2)
    a = HyperLogLog(p=12).add_hashes(a_h)
    b = HyperLogLog(p=12).add_hashes(b_h)
    union = HyperLogLog(p=12).add_hashes(np.concatenate([a_h, b_h]))
    merged = a.merge(b)
    assert (merged.registers == union.registers).all()
    assert merged.estimate() == union.estimate()


def test_hll_duplicates_dont_inflate():
    h1 = HyperLogLog(p=12).add_hashes(_hashes(1000))
    h2 = HyperLogLog(p=12).add_hashes(
        np.tile(_hashes(1000), 50)  # same 1000 values, 50x over
    )
    assert h1.estimate() == h2.estimate()


def test_approx_distinct_on_dataset(ray_session, sf_small):
    import pyarrow.parquet as pq

    exact = len(
        set(
            pq.read_table(
                f"{sf_small}/events.parquet", columns=["user_id"]
            )["user_id"].to_pylist()
        )
    )
    ds = ray.data.read_parquet(
        f"{sf_small}/events.parquet", columns=["user_id"]
    )
    est = approx_distinct(ds, "user_id", p=12)
    assert abs(est - exact) / exact < 0.1
    # deterministic across runs (fixed hashing, order-free merge)
    assert approx_distinct(ds, "user_id", p=12) == est


def test_hll_anchored_to_exact_companion_query(ray_session, sf_small):
    """The driver-facing HLL row RETURNS its accuracy certificate
    (round-5 fold): the oracle-recomputed exact count plus the
    within-5% verdict, both hash-compared by the gate.  The raw
    estimate itself is re-checked here against the library sketch."""
    import ray as _ray

    import __ray_entry__ as m
    from cex_crawler_ray.stages.sketch import approx_distinct

    exact = int(
        m.queries()["exact_distinct_users"](sf_small)["n_users"].iloc[0]
    )
    cert = m.queries()["approx_distinct_users"](sf_small)
    assert int(cert["n_users"].iloc[0]) == exact > 0
    assert int(cert["hll_within_5pct"].iloc[0]) == 1
    ds = _ray.data.read_parquet(
        f"{sf_small}/events.parquet", columns=["user_id"]
    )
    est = approx_distinct(ds, "user_id", p=12)
    assert abs(est - exact) / exact < 0.05


def test_bottom_k_quantile_exact_when_small(ray_session, sf_tiny):
    """Groups with <= k rows sample everything -> exact agreement with
    the oracle-backed exact group median (library path), and the
    driver-facing certificate row (round-5 fold) reports every group's
    rank fraction in-band with sample_size == n_rows."""
    import ray as _ray

    import __ray_entry__ as m
    from cex_crawler_ray.stages.sketch import approx_group_quantile

    exact = (
        m.queries()["group_median"](sf_tiny)
        .to_pandas()
        .set_index("event_type")["median_cents"]
        .to_dict()
    )
    ds = _ray.data.read_parquet(
        f"{sf_tiny}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def add_cents(batch):
        import pyarrow as pa

        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "cents": pa.array(
                    [int(round(v * 100)) for v in batch["value"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    approx = (
        approx_group_quantile(
            ds.map_batches(add_cents, batch_format="pyarrow"),
            "event_type", "cents", "event_id", q=0.5, k=1024,
        )
        .to_pandas()
        .set_index("event_type")
    )
    assert set(approx.index) == set(exact)
    for g, row in approx.iterrows():
        assert row["approx_quantile"] == exact[g], g
        assert row["sample_size"] <= 1024

    cert = (
        m.queries()["approx_group_median"](sf_tiny)
        .set_index("event_type")
    )
    assert set(cert.index) == set(exact)
    assert (cert["rank_frac_in_band"] == 1).all()
    # sf_tiny groups fit in the sample entirely
    assert (cert["sample_size"] == cert["n_rows"]).all()


def test_bottom_k_quantile_merge_and_accuracy(ray_session):
    """Above k rows the estimate is approximate but bounded, mergeable
    (block-split invariant) and deterministic."""
    import numpy as np

    import ray as _ray

    from cex_crawler_ray.stages.sketch import approx_group_quantile

    rng = np.random.RandomState(9)
    vals = rng.randint(0, 100_000, size=20_000)
    rows = [
        {"id": i, "g": "a", "v": int(v)} for i, v in enumerate(vals)
    ]
    for blocks in (2, 16):
        ds = _ray.data.from_items(rows, override_num_blocks=blocks)
        out = approx_group_quantile(
            ds, "g", "v", "id", q=0.5, k=512
        ).to_pandas()
        est = out["approx_quantile"].iloc[0]
        true = np.sort(vals)[(len(vals) - 1) // 2]
        # k=512 -> stderr ~ sqrt(0.25/512) ~ 2.2% of the range at the
        # median; allow 10% relative slack
        assert abs(est - true) / true < 0.10, (blocks, est, true)
        if blocks == 2:
            first = est
    # block-split invariance (mergeability): identical sample selection
    ds2 = _ray.data.from_items(rows, override_num_blocks=16)
    out2 = approx_group_quantile(ds2, "g", "v", "id", q=0.5, k=512).to_pandas()
    assert out2["approx_quantile"].iloc[0] == first


def test_exact_global_quantile_matches_duckdb_conventions(ray_session):
    """Histogram-descent selection == DuckDB quantile_disc across odd /
    even n, negative values, heavy ties and several q."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    import ray

    from cex_crawler_ray.stages.sketch import exact_global_quantile

    rng = np.random.RandomState(11)
    cases = [
        rng.randint(-1000, 70000, size=997),
        rng.randint(-5, 5, size=1000),          # heavy ties, negatives
        np.arange(10, dtype=np.int64),          # tiny n
        rng.randint(0, 2**30, size=2048),       # wide range, many buckets
    ]
    for vals in cases:
        ds = ray.data.from_arrow(
            pa.table({"cents": pa.array(vals.astype(np.int64), pa.int64())})
        ).repartition(4)
        for q in (0.1, 0.25, 0.5, 0.9, 0.91, 0.99):
            got = exact_global_quantile(ds, col="cents", q=q)
            want = duckdb.sql(
                f"SELECT quantile_disc(c, {q}) FROM "
                "(SELECT unnest($v) AS c)",
                params={"v": vals.tolist()},
            ).fetchone()[0]
            assert got == want, (q, got, want, len(vals))


def test_exact_group_quantile_descent_matches_sort(ray_session):
    """Keyed histogram descent equals the sort-based per-group
    quantile_disc (rank ceil(q*n)-1) on a skewed multi-key input."""
    import numpy as np
    import pandas as pd

    import ray
    from cex_crawler_ray.stages.sketch import exact_group_quantile_descent

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b", "c"], [3000, 50, 7]),
            "cents": np.concatenate(
                [
                    rng.integers(-10**6, 10**6, 3000),
                    rng.integers(0, 100, 50),
                    np.arange(7),
                ]
            ),
        }
    )
    got = (
        exact_group_quantile_descent(
            ray.data.from_pandas(df).repartition(5),
            "k",
            "cents",
            q=0.9,
            shift=6,
            num_parts=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    import math

    want = {
        k: int(np.sort(g["cents"].to_numpy())[max(math.ceil(0.9 * len(g)) - 1, 0)])
        for k, g in df.groupby("k")
    }
    assert dict(zip(got["k"], got["q_value"].astype(int))) == want


def test_kmv_exact_regime(ray_session):
    """Unsaturated sketches hold every hash: all four numbers exact."""
    import numpy as np
    import pandas as pd

    import ray
    from cex_crawler_ray.stages.sketch import kmv_jaccard

    a = pd.DataFrame({"u": np.arange(0, 600, dtype=np.int64)})
    b = pd.DataFrame({"u": np.arange(400, 1000, dtype=np.int64)})
    r = kmv_jaccard(
        ray.data.from_pandas(a).repartition(3),
        ray.data.from_pandas(b).repartition(3),
        col="u",
        k=4096,
    )
    assert r["exact"] is True
    assert (r["n_a"], r["n_b"]) == (600, 600)
    assert (r["n_inter"], r["n_union"]) == (200, 1000)


def test_kmv_saturated_estimates_within_tolerance(ray_session):
    """Saturated regime: union and intersection estimates land within
    20% of truth on a 50%-overlap pair (k = 512 over 20k distinct)."""
    import numpy as np
    import pandas as pd

    import ray
    from cex_crawler_ray.stages.sketch import kmv_jaccard

    n = 20_000
    a = pd.DataFrame({"u": np.arange(0, n, dtype=np.int64)})
    b = pd.DataFrame({"u": np.arange(n // 2, n + n // 2, dtype=np.int64)})
    r = kmv_jaccard(
        ray.data.from_pandas(a).repartition(4),
        ray.data.from_pandas(b).repartition(4),
        col="u",
        k=512,
    )
    assert r["exact"] is False
    true_union = n + n // 2
    true_inter = n // 2
    assert abs(r["n_union"] - true_union) / true_union < 0.2
    assert abs(r["n_inter"] - true_inter) / true_inter < 0.25


def test_count_min_event_domain_collision_free():
    """The fixed 5-key event-type domain must stay pairwise
    collision-free in EVERY sketch row — the data-independent property
    that makes q_cm_event_counts exact at any scale."""
    import numpy as np

    from cex_crawler_ray.stages.sketch import CountMin, _str_hash64

    keys = ["click", "error", "purchase", "signup", "view"]
    cm = CountMin()
    pos = cm._positions(_str_hash64(keys))
    for d in range(cm.depth):
        assert len(set(pos[d].tolist())) == len(keys)


def test_count_min_overestimates_never_under(ray_session):
    """CM point estimates are >= the exact count for every key, and
    exact when collision-free; merge order must not matter."""
    import numpy as np
    import pandas as pd

    import ray
    from cex_crawler_ray.stages.sketch import count_min_counts

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=20_000)
    df = pd.DataFrame({"k": [f"u{v}" for v in vals]})
    ds = ray.data.from_pandas(df).repartition(8)
    qkeys = [f"u{v}" for v in range(0, 500, 25)]
    out = count_min_counts(ds, "k", qkeys, width=256, depth=4).to_pandas()
    exact = df["k"].value_counts()
    for _, row in out.iterrows():
        assert row["est_n"] >= int(exact.get(row["key"], 0))
