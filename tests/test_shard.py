"""Hash-sharded training output writer."""

import os

import pyarrow as pa

import ray

from cex_crawler_ray.stages.shard import KNUTH


def _docs(n):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([f"doc {i} text" for i in range(n)]),
            }
        )
    )


def test_assign_shards_deterministic(ray_session):
    from cex_crawler_ray.stages.shard import assign_shards

    out = assign_shards(_docs(100), 8).to_pandas()
    expect = [(i * KNUTH) % (1 << 32) % 8 for i in range(100)]
    got = out.sort_values("doc_id")["shard"].tolist()
    assert got == expect
    assert len(set(got)) == 8  # all shards populated


def test_write_read_roundtrip(ray_session, tmp_path):
    from cex_crawler_ray.stages.shard import (
        shard_summary,
        write_training_shards,
    )

    out_dir = str(tmp_path / "shards")
    write_training_shards(_docs(200), out_dir, num_shards=4)
    # hive layout: one directory per shard (resumable partitions)
    assert sorted(
        d for d in os.listdir(out_dir) if d.startswith("shard=")
    ) == ["shard=0", "shard=1", "shard=2", "shard=3"]
    summ = shard_summary(out_dir).to_pandas().sort_values("shard")
    assert summ["n_docs"].sum() == 200
    expect_counts = {}
    for i in range(200):
        s = (i * KNUTH) % (1 << 32) % 4
        expect_counts[s] = expect_counts.get(s, 0) + 1
    assert dict(zip(summ["shard"], summ["n_docs"])) == expect_counts
