"""Sequence-packing index (distributed prefix sum)."""

import pyarrow as pa

import ray


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )


def test_pack_index_offsets(ray_session):
    from cex_crawler_ray.stages.pack import pack_index

    # token counts: 3, 2, 4, 1 in doc_id order (ids cross buckets)
    ds = _docs(
        [(0, "a b c"), (5, "d e"), (17, "f g h i"), (130, "j")]
    )
    out = (
        pack_index(ds, seq_len=4, bucket=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 2, 4, 1]
    assert out["start_offset"].tolist() == [0, 3, 5, 9]
    assert out["example_id"].tolist() == [0, 0, 1, 2]


def test_pack_index_matches_serial(ray_session):
    from cex_crawler_ray.stages.pack import pack_index

    rows = [(i * 3, "w " * (i % 7)) for i in range(200)]
    out = (
        pack_index(_docs(rows), seq_len=10, bucket=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    off = 0
    for (doc_id, t), got_n, got_off in zip(
        rows, out["n_tokens"], out["start_offset"]
    ):
        n = len(t.split())
        assert got_n == n
        assert got_off == off
        off += n
