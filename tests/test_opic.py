"""OPIC page importance (Abiteboul et al. WWW'03): driver/distributed
bit-equality, virtual-node dangling redistribution, mass bounds."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from cex_crawler_ray.stages.window import _opic_driver, opic_scores

SCALE = 10**12


def _graph(n_nodes=120):
    src, dst = [], []
    for i in range(n_nodes):
        if i % 5 == 4:  # dangling
            continue
        for t in ((i + 1) % n_nodes, (3 * i) % n_nodes):
            if t != i:
                src.append(i)
                dst.append(t)
    e = (
        pd.DataFrame({"src": src, "dst": dst})
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return e


def test_driver_and_distributed_bit_equal(ray_session):
    e = _graph()
    ref = (
        _opic_driver(
            e["src"].to_numpy(np.int64),
            e["dst"].to_numpy(np.int64),
            5,
            SCALE,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    ds = ray.data.from_arrow(
        pa.Table.from_pandas(e, preserve_index=False)
    )
    a = (
        opic_scores(ds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        opic_scores(ds.repartition(7), driver_max_edges=0, num_parts=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert a.equals(ref)
    assert b.equals(ref)


def test_mass_conserved_up_to_floor_loss(ray_session):
    e = _graph()
    out = _opic_driver(
        e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64), 4, SCALE
    ).to_pandas()
    total = out["opic_rank"].sum()
    # history holds (iters) rounds of cash + the final cash: at most
    # (iters+1) * scale, minus floor-division losses, never more
    assert total <= 5 * SCALE
    assert total >= 5 * SCALE - 5 * (len(out) + len(e))


def test_dangling_cash_redistributes(ray_session):
    # star: 0 -> 1, 1 dangling.  Node 1's cash must flow back to both
    # nodes via the virtual node, not vanish.
    out = _opic_driver(
        np.array([0], np.int64), np.array([1], np.int64), 3, 10**6
    ).to_pandas()
    ranks = dict(zip(out["node"], out["opic_rank"]))
    # importance concentrates at 1 (receives everything 0 holds) but 0
    # keeps a nonzero share from the virtual redistribution
    assert ranks[1] > ranks[0] > 0


def test_empty_edges(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
            }
        )
    )
    assert opic_scores(ds).count() == 0
