"""Snapshot-versioned table: commit protocol, time travel, vacuum."""

import os

import pandas as pd

import ray

from cex_crawler_ray.state import table_format as tf


def _df(lo, hi):
    return pd.DataFrame({"k": range(lo, hi), "v": range(lo, hi)})


def _read(tdir, v=None):
    return (
        tf.read_snapshot(tdir, v)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
        .astype("int64")
    )


def test_append_and_time_travel(ray_session, tmp_path):
    tdir = str(tmp_path / "t")
    v0 = tf.overwrite(tdir, ray.data.from_pandas(_df(0, 5)))
    v1 = tf.append(tdir, ray.data.from_pandas(_df(5, 8)))
    assert (v0, v1) == (0, 1)
    assert _read(tdir, 0)["k"].tolist() == list(range(5))
    assert _read(tdir, 1)["k"].tolist() == list(range(8))
    assert _read(tdir)["k"].tolist() == list(range(8))  # latest


def test_compact_preserves_rows_and_history(ray_session, tmp_path):
    tdir = str(tmp_path / "t")
    tf.overwrite(tdir, ray.data.from_pandas(_df(0, 6)).repartition(6))
    tf.append(tdir, ray.data.from_pandas(_df(6, 9)).repartition(3))
    v2 = tf.compact(tdir, num_files=2)
    assert v2 == 2
    pd.testing.assert_frame_equal(_read(tdir, 2), _read(tdir, 1))
    # pre-compaction snapshots still readable
    assert _read(tdir, 0)["k"].tolist() == list(range(6))
    # compacted snapshot reads from its own dir only
    man = tf._read_manifest(tdir, 2)
    assert man["dirs"] == [os.path.join("data", "v2")]


def test_orphan_data_dir_is_ignored_and_purged(ray_session, tmp_path):
    """A writer that died after writing data but before commit leaves
    an orphan dir: readers never see it, the next write removes it."""
    tdir = str(tmp_path / "t")
    tf.overwrite(tdir, ray.data.from_pandas(_df(0, 4)))
    # simulate a crashed append: data written for v1, no manifest
    orphan = os.path.join(tdir, "data", "v1")
    ray.data.from_pandas(_df(100, 110)).write_parquet(orphan)
    assert _read(tdir)["k"].tolist() == list(range(4))  # not visible
    v1 = tf.append(tdir, ray.data.from_pandas(_df(4, 6)))
    assert v1 == 1
    # the re-run append must NOT contain the crashed attempt's rows
    assert _read(tdir, 1)["k"].tolist() == list(range(6))


def test_vacuum_drops_history_keeps_latest(ray_session, tmp_path):
    tdir = str(tmp_path / "t")
    tf.overwrite(tdir, ray.data.from_pandas(_df(0, 4)).repartition(2))
    tf.append(tdir, ray.data.from_pandas(_df(4, 6)))
    tf.compact(tdir, num_files=1)
    dropped = tf.vacuum(tdir, keep_last=1)
    assert dropped == [0, 1]
    assert _read(tdir)["k"].tolist() == list(range(6))
    # old data dirs are gone, old reads fail
    assert not os.path.isdir(os.path.join(tdir, "data", "v0"))
    try:
        tf.read_snapshot(tdir, 0)
        raise AssertionError("expected missing manifest")
    except FileNotFoundError:
        pass
