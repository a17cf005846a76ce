"""Hamilton largest-remainder crawl-budget apportionment."""

import numpy as np
import pandas as pd


def _apportion(names, demand, budget):
    import __ray_entry__ as e

    return e._hamilton_apportion(np.array(names), demand, budget)


def test_skewed_remainders_sum_to_budget():
    out = _apportion(["a", "b", "c", "d"], [7, 1, 1, 1], 10)
    assert out["allocated"].sum() == 10
    # quotas: 7.0, 1.0, 1.0, 1.0 exactly -> no remainder step
    assert out["allocated"].tolist() == [7, 1, 1, 1]


def test_remainder_bonus_ranks_by_fraction_then_name():
    # budget 10, demand 3/3/3/2 (total 11): floors 2,2,2,1 = 7,
    # leftover 3; remainders 8,8,8,9 -> 'd' has the LARGEST remainder
    # and wins first, then 'a','b' by name-ascending tiebreak
    out = _apportion(["a", "b", "c", "d"], [3, 3, 3, 2], 10)
    assert out["allocated"].tolist() == [3, 3, 2, 2]
    assert out["allocated"].sum() == 10


def test_name_tiebreak_ascending():
    # two equal remainders, one bonus slot -> lexicographically first
    # name wins (matches the SQL twin's ORDER BY rem DESC, host ASC)
    out = _apportion(["z", "a"], [1, 1], 3)
    assert out.set_index("host")["allocated"].to_dict() == {"a": 2, "z": 1}


def test_matches_sql_twin_on_skew():
    import duckdb

    names = [f"h{i}" for i in range(9)]
    demand = [13, 7, 5, 3, 2, 2, 1, 1, 1]
    budget = 17
    ours = _apportion(names, demand, budget).sort_values("host")
    rows = ", ".join(
        f"('{n}', {d})" for n, d in zip(names, demand)
    )
    sql = f"""
WITH d(host, demand) AS (VALUES {rows}),
t AS (SELECT sum(demand) AS total FROM d),
q AS (
  SELECT host, demand,
         demand * {budget} // t.total AS fl,
         demand * {budget} % t.total AS rem
  FROM d, t
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, host ASC) AS rnk,
         (SELECT {budget} - sum(fl) FROM q) AS leftover
  FROM q
)
SELECT host, demand,
       fl + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS allocated
FROM r ORDER BY host
"""
    theirs = duckdb.sql(sql).df()
    pd.testing.assert_frame_equal(
        ours.reset_index(drop=True).astype({"demand": "int64", "allocated": "int64"}),
        theirs.astype({"demand": "int64", "allocated": "int64"}),
        check_dtype=False,
    )
