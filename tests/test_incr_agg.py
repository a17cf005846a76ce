"""Incremental aggregate maintenance: generations, crash-safety shape,
from-scratch equality."""

import os

import numpy as np
import pandas as pd
import pytest

import ray

from cex_crawler_ray.state.incr_agg import update_group_sums


def test_incremental_equals_scratch(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 500),
            "v": rng.integers(-100, 100, 500),
        }
    )
    state = str(tmp_path / "st")
    # three increments
    out = None
    for lo, hi in [(0, 150), (150, 300), (300, 500)]:
        part = ray.data.from_pandas(df.iloc[lo:hi]).repartition(3)
        out = update_group_sums(state, part, "k", "v")
    got = (
        out.to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
        .astype({"k": "int64", "n": "int64", "sum_val": "int64"})
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(n=("v", "size"), sum_val=("v", "sum"))
        .sort_values("k")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)
    # exactly one surviving generation + manifest
    names = sorted(os.listdir(state))
    gens = [n for n in names if n.startswith("gen-")]
    assert gens == ["gen-2"]
    assert "manifest.json" in names


def test_incremental_new_keys_join_state(ray_session, tmp_path):
    state = str(tmp_path / "st2")
    a = pd.DataFrame({"k": [1, 1, 2], "v": [10, 20, 5]})
    b = pd.DataFrame({"k": [2, 3], "v": [7, 9]})  # 3 is a NEW key
    update_group_sums(state, ray.data.from_pandas(a), "k", "v")
    out = (
        update_group_sums(state, ray.data.from_pandas(b), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["n"].tolist() == [2, 2, 1]
    assert out["sum_val"].tolist() == [30, 12, 9]
