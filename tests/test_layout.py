"""Z-order layout: Morton interleave, zone maps, partitioned write."""

import glob

import numpy as np
import pandas as pd

import ray


def test_morton_interleave_bits():
    from cex_crawler_ray.stages.layout import morton_interleave16

    x = np.array([0, 1, 0, 3, 0xFFFF], np.int64)
    y = np.array([0, 0, 1, 5, 0xFFFF], np.int64)
    z = morton_interleave16(x, y)
    # x -> even bits, y -> odd bits
    assert z[0] == 0
    assert z[1] == 1
    assert z[2] == 2
    # x=3 (0b11) even bits -> 0b0101; y=5 (0b101) odd bits -> 0b100010
    assert z[3] == 0b0101 | 0b100010
    assert z[4] == 0xFFFFFFFF


def test_morton_locality_monotone_quadrants():
    """The top 2 Z-bits are the (y_hi, x_hi) quadrant: all points of a
    quadrant share a bucket prefix — the property pruning relies on."""
    from cex_crawler_ray.stages.layout import morton_interleave16

    rng = np.random.default_rng(7)
    x = rng.integers(0, 65536, 500, dtype=np.int64)
    y = rng.integers(0, 65536, 500, dtype=np.int64)
    z = morton_interleave16(x, y)
    quad = ((y >> 15) << 1) | (x >> 15)
    assert np.array_equal((z >> 30).astype(np.int64), quad)


def test_zone_maps_bound_rows(ray_session):
    """Every row's (x, y) must lie inside its bucket's zone map, and
    bucket row counts must sum to the input size."""
    from cex_crawler_ray.stages.layout import (
        morton_interleave16,
        zorder_zone_maps,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "x": rng.integers(0, 5000, 2000, dtype=np.int64),
            "y": rng.integers(0, 400, 2000, dtype=np.int64),
        }
    )
    zm = (
        zorder_zone_maps(
            ray.data.from_pandas(df).repartition(4),
            "x",
            "y",
            bucket_bits=8,
            num_parts=8,
        )
        .to_pandas()
        .set_index("bucket")
    )
    assert zm["n"].sum() == len(df)
    b = (
        morton_interleave16(df["x"].to_numpy(), df["y"].to_numpy()).astype(
            np.uint64
        )
        >> np.uint64(24)
    ).astype(np.int64)
    for col, lo, hi in [("x", "min_x", "max_x"), ("y", "min_y", "max_y")]:
        v = df[col].to_numpy()
        assert (v >= zm.loc[b, lo].to_numpy()).all()
        assert (v <= zm.loc[b, hi].to_numpy()).all()


def test_zorder_write_partitions(ray_session, tmp_path):
    from cex_crawler_ray.stages.layout import zorder_write

    df = pd.DataFrame(
        {
            "x": np.arange(200, dtype=np.int64) % 7,
            "y": np.arange(200, dtype=np.int64) % 11,
            "payload": np.arange(200, dtype=np.int64),
        }
    )
    out = str(tmp_path / "zw")
    zorder_write(
        ray.data.from_pandas(df).repartition(3), out, "x", "y",
        bucket_bits=4,
    )
    parts = glob.glob(f"{out}/zb=*")
    assert len(parts) >= 1
    back = ray.data.read_parquet(out).to_pandas()
    assert sorted(back["payload"].tolist()) == list(range(200))
