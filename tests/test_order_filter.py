"""Exact order-statistic band filter."""

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


def test_value_band_cuts_rank_semantics():
    from cex_crawler_ray.stages.order_filter import value_band_cuts

    # values 1..10, one each: p10 -> rank ceil(1.0)=1 -> 1;
    # p90 -> rank 9 -> 9
    hist = pa.table(
        {
            "v": pa.array(list(range(1, 11)), pa.int64()),
            "c": pa.array([1] * 10, pa.int64()),
        }
    )
    assert value_band_cuts(hist, 0.1, 0.9) == (1, 9)
    # duplicated mass: [5]*9 + [100]*1 -> p50 value is 5, p95 -> 100
    hist2 = pa.table(
        {
            "v": pa.array([5, 100], pa.int64()),
            "c": pa.array([9, 1], pa.int64()),
        }
    )
    assert value_band_cuts(hist2, 0.5, 0.95) == (5, 100)


def test_length_band_filter_keeps_middle(ray_session):
    from cex_crawler_ray.stages.order_filter import length_band_filter

    # lengths 1..10 (doc i has i chars)
    ds = _docs([(i, "x" * i) for i in range(1, 11)])
    out = (
        length_band_filter(ds, lo_frac=0.2, hi_frac=0.8)
        .to_pandas()
        .sort_values("doc_id")
    )
    # rank ceil(0.2*10)=2 -> len 2; rank ceil(0.8*10)=8 -> len 8
    assert out["n_chars"].tolist() == list(range(2, 9))
