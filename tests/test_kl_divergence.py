"""Per-source KL divergence: Gibbs bound + invariance + zero case."""

import numpy as np
import pandas as pd

import ray


def test_kl_properties(ray_session):
    from cex_crawler_ray.stages.textstats import kl_divergence_by_source

    rng = np.random.RandomState(4)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    # source A skews to alpha, B to beta, C uniform
    for s, w in (("A", [6, 1, 1, 1, 1]), ("B", [1, 6, 1, 1, 1]),
                 ("C", [1, 1, 1, 1, 1])):
        p = np.array(w, float) / sum(w)
        for _ in range(60):
            toks = rng.choice(vocab, size=30, p=p)
            rows.append((s, " ".join(toks)))
    df = pd.DataFrame(rows, columns=["source", "text"])

    outs = []
    for parts in (2, 7):
        out = (
            kl_divergence_by_source(
                ray.data.from_pandas(df).repartition(parts), num_parts=8
            )
            .to_pandas()
            .set_index("source")["kl_e9"]
            .to_dict()
        )
        outs.append(out)
    assert outs[0] == outs[1]
    got = outs[0]
    # Gibbs: KL >= 0 (up to per-term 1e-9 quantization, slack 100 units)
    assert all(v >= -100 for v in got.values()), got
    # skewed sources diverge more than the near-uniform one
    assert got["A"] > got["C"] and got["B"] > got["C"]


def test_kl_single_source_is_zero(ray_session):
    """One source == the corpus -> every term's log ratio is ln(1)."""
    from cex_crawler_ray.stages.textstats import kl_divergence_by_source

    df = pd.DataFrame(
        {"source": ["only"] * 10, "text": ["x y z w"] * 10}
    )
    out = (
        kl_divergence_by_source(ray.data.from_pandas(df), num_parts=4)
        .to_pandas()
    )
    assert out["kl_e9"].tolist() == [0]
