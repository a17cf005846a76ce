"""Distributed statistical aggregates built on the combiner pattern:
per-batch sufficient statistics -> one tiny keyed shuffle -> closed-form
finish on the merged sums.  Nothing row-sized crosses the exchange.

Reference parity note: the reference engine has no statistical
aggregates; these belong to the beyond-reference training-data layer
(data-quality profiling of a 100-TB corpus — e.g. "is token count
correlated with quality score per language?") and follow the same
partial-aggregation shape as ``stages/sketch.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def group_corr(
    ds: "ray.data.Dataset",
    key_col: str,
    x_col: str,
    y_col: str,
) -> pa.Table:
    """Per-group Pearson correlation via sufficient statistics.

    Each batch emits one row per (batch, key): n, Σx, Σy, Σxy, Σx², Σy²
    (float64 — the magnitudes overflow int64 at corpus scale, and the
    final division is float anyway).  The shuffle carries only those
    6 numbers per (batch, key); the merged table is one row per key and
    the corr formula closes on the driver.

    corr = (nΣxy - ΣxΣy) / sqrt((nΣx² - (Σx)²)(nΣy² - (Σy)²))

    Groups with zero variance in either column yield null.
    """

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        x = df[x_col].astype(np.float64)
        y = df[y_col].astype(np.float64)
        g = pd.DataFrame(
            {
                key_col: df[key_col],
                "n": np.ones(len(df), np.float64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        ).groupby(key_col, as_index=False)
        return g.sum()

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .sum(["n", "sx", "sy", "sxy", "sxx", "syy"])
        .to_pandas()
    )
    merged.columns = [key_col, "n", "sx", "sy", "sxy", "sxx", "syy"]
    n = merged["n"].to_numpy()
    sx = merged["sx"].to_numpy()
    sy = merged["sy"].to_numpy()
    cov = n * merged["sxy"].to_numpy() - sx * sy
    vx = n * merged["sxx"].to_numpy() - sx * sx
    vy = n * merged["syy"].to_numpy() - sy * sy
    denom = np.sqrt(vx * vy)
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(denom > 0, cov / denom, np.nan)
    out = pa.table(
        {
            key_col: pa.array(merged[key_col].tolist()),
            "corr": pa.array(corr, pa.float64()),
        }
    )
    return out
