"""Packed-payload co-group hash_join vs the null-padded union twin.

Round-3 verdict item 3: the exchange should carry each side's own
columns only (lz4 Arrow IPC payload per local partition), not both
sides null-padded to the union schema.  These tests pin the packed
path to the padded path row-for-row.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from cex_crawler_ray.stages.join import (
    _pack_side,
    _pack_table,
    _unpack_table,
    hash_join,
    hash_join_padded,
)


def _collect(ds, sort_cols):
    df = ds.to_pandas()
    return (
        df.sort_values(sort_cols, kind="mergesort")
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


def _rand_sides(seed, n_left=500, n_right=300, key_space=120):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, key_space, n_left),
            "lv": rng.integers(-(10**9), 10**9, n_left),
            "ls": [f"l{i % 17}" for i in range(n_left)],
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, key_space, n_right),
            "rv": rng.normal(size=n_right),
        }
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("seed", [0, 7])
def test_packed_equals_padded(ray_session, how, seed):
    left, right = _rand_sides(seed)
    # Arrow-backed, like every production call site (read_parquet)
    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right))
    packed = _collect(
        hash_join(lds, rds, "k", "rk", num_parts=8, how=how),
        ["k", "lv", "ls"],
    )
    padded = _collect(
        hash_join_padded(lds, rds, "k", "rk", num_parts=8, how=how),
        ["k", "lv", "ls"],
    )
    # padded path restores ints explicitly; align dtypes before compare
    pd.testing.assert_frame_equal(
        packed.astype({"k": "int64", "lv": "int64"}, errors="ignore"),
        padded,
        check_dtype=False,
        check_like=True,
    )


def test_packed_one_sided_partitions(ray_session):
    # disjoint key ranges: most partitions see a single side
    left = pd.DataFrame({"k": np.arange(0, 50), "lv": np.arange(50)})
    right = pd.DataFrame({"rk": np.arange(40, 90), "rv": np.arange(50)})
    out = _collect(
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            "k",
            "rk",
            num_parts=16,
        ),
        ["k"],
    )
    assert list(out["k"]) == list(range(40, 50))


def test_packed_empty_right(ray_session):
    left = pd.DataFrame({"k": np.arange(10), "lv": np.arange(10)})
    right = pd.DataFrame(
        {"rk": np.array([], dtype=np.int64), "rv": np.array([], dtype=np.int64)}
    )
    out = hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        "k",
        "rk",
        num_parts=4,
    )
    assert out.count() == 0


def test_packed_many_to_many(ray_session):
    left = pd.DataFrame({"k": [1, 1, 2], "lv": [10, 11, 20]})
    right = pd.DataFrame({"rk": [1, 1, 3], "rv": [100, 101, 300]})
    out = _collect(
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            "k",
            "rk",
            num_parts=4,
        ),
        ["k", "lv", "rv"],
    )
    assert len(out) == 4  # 2 left x 2 right on key 1
    assert set(zip(out["lv"], out["rv"])) == {
        (10, 100),
        (10, 101),
        (11, 100),
        (11, 101),
    }


def test_pack_roundtrip_preserves_types():
    t = pa.table(
        {
            "a": pa.array([1, 2], pa.int32()),
            "b": pa.array(["x", None], pa.large_string()),
            "c": pa.array([b"\x00\x01", b""], pa.binary()),
        }
    )
    rt = _unpack_table(_pack_table(t))
    assert rt.schema.equals(t.schema)
    assert rt.equals(t)


def test_pack_side_partition_assignment():
    t = pa.table({"k": pa.array(np.arange(100), pa.int64())})
    out = _pack_side("l", "k", 8)(t)
    # every row lands in exactly one payload; reassembly covers all keys
    seen = []
    for payload in out["__payload"].to_pylist():
        seen.extend(_unpack_table(payload)["k"].to_pylist())
    assert sorted(seen) == list(range(100))
    # partition ids consistent with the hash
    golden = np.uint64(0x9E3779B97F4A7C15)
    for part, payload in zip(
        out["__part"].to_pylist(), out["__payload"].to_pylist()
    ):
        ks = np.array(_unpack_table(payload)["k"].to_pylist(), dtype=np.uint64)
        assert ((ks * golden) % np.uint64(8) == np.uint64(part)).all()
