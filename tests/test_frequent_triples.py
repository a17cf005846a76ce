"""A-priori frequent triples: lossless prune vs brute force."""

from itertools import combinations

import numpy as np
import pandas as pd

import ray


def _brute(df, min_support):
    cnt = {}
    for _, g in df.drop_duplicates().groupby("l_orderkey"):
        for t in combinations(sorted(g["l_partkey"].tolist()), 3):
            cnt[t] = cnt.get(t, 0) + 1
    return sorted(
        (a, b, c, n) for (a, b, c), n in cnt.items() if n >= min_support
    )


def test_triples_equal_brute_force(ray_session):
    from cex_crawler_ray.stages.sequence import frequent_triples

    rng = np.random.RandomState(11)
    rows = []
    for o in range(200):
        for i in rng.choice(30, size=rng.randint(2, 7), replace=False):
            rows.append((o, int(i)))
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    out = (
        frequent_triples(
            ray.data.from_pandas(df).repartition(6),
            min_support=2,
            num_parts=8,
        )
        .to_pandas()
        .sort_values(["item_a", "item_b", "item_c"])
    )
    got = list(map(tuple, out.to_numpy()))
    assert got == _brute(df, 2)
    assert len(got) > 0  # corpus dense enough to be a real test


def test_triples_empty_candidate_set(ray_session):
    """Every pair unique -> no frequent pairs -> early empty return."""
    from cex_crawler_ray.stages.sequence import frequent_triples

    df = pd.DataFrame(
        {"l_orderkey": [1, 1, 2, 2], "l_partkey": [1, 2, 3, 4]}
    )
    ds = frequent_triples(
        ray.data.from_pandas(df), min_support=2, num_parts=4
    )
    assert ds.count() == 0
    # schema survives on the Arrow block (Dataset.to_pandas drops
    # column names on empty results — a Ray conversion quirk)
    import pyarrow as pa

    blocks = ray.get(ds.to_arrow_refs())
    tbl = pa.concat_tables(blocks, promote_options="default")
    assert tbl.column_names == ["item_a", "item_b", "item_c", "n_orders"]
