"""Two-phase skyline: O(n^2) dominance reference, tie/duplicate
semantics, partition invariance."""

import numpy as np
import pandas as pd

import ray


def _brute_front(df):
    p = df["o_totalprice"].to_numpy(np.float64)
    d = df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
    keep = []
    for i in range(len(df)):
        dominated = (
            (p >= p[i])
            & (d <= d[i])
            & ((p > p[i]) | (d < d[i]))
        ).any()
        if not dominated:
            keep.append(i)
    return set(df["o_orderkey"].to_numpy(np.int64)[keep].tolist())


def _frame(seed=13, n=400):
    rng = np.random.default_rng(seed)
    price = rng.uniform(10, 1000, n).round(2)
    days = rng.integers(0, 900, n)
    # plant exact (price, date) twins: both must survive if on the front
    price[10] = price[40]
    days[10] = days[40]
    # plant a price tie with different dates: only the earlier survives
    price[20] = price[60] = 999_999.0
    days[20], days[60] = 5, 6
    return pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_totalprice": price,
            "o_orderdate": np.datetime64("1995-01-01")
            + days.astype("timedelta64[D]"),
        }
    )


def test_pareto_front_kernel_matches_brute_force():
    from __ray_entry__ import _pareto_front

    df = _frame()
    got = set(_pareto_front(df)["o_orderkey"].astype("int64").tolist())
    assert got == _brute_front(df)
    # the price-tie plant: earlier date survives, later is dominated
    assert 20 in got and 60 not in got


def test_pareto_two_phase_partition_invariance(ray_session, tmp_path):
    import __ray_entry__ as m

    df = _frame(seed=14, n=1_000)
    expected = _brute_front(df)
    for parts in (1, 7):
        p = str(tmp_path / f"orders_{parts}")
        ray.data.from_pandas(df).repartition(parts).write_parquet(p)
        out = m.q_pareto_orders_from_path(p)
        assert set(out["o_orderkey"].tolist()) == expected
