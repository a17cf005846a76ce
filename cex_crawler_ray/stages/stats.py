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

import re

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


def group_zscore(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    id_col: str,
    checkpoint_input: bool = False,
) -> "ray.data.Dataset":
    """Per-group z-score normalization — the feature-scaling pass a
    training pipeline runs before mixing heterogeneous sources.

    Two streaming passes over the SAME lazy input:

    1. combiner: per-batch (key, n, Σx, Σx²) float64 partials through
       one tiny keyed shuffle — one row per (batch, key);
    2. the per-key (mean, std) table (one row per key) is broadcast via
       ``ray.put`` and applied row-wise with numpy; the corpus itself
       never shuffles.

    std is population (σ = sqrt(Σx²/n - mean²)), matching the explicit
    SQL formula in the oracle so both sides share float behavior.
    Output z is 1e-2 fixed point; zero-variance groups yield z_e2=0.

    The input is consumed twice (stats pass + apply pass); set
    ``checkpoint_input=True`` when it is a long transform chain rather
    than a bare parquet read (the ``pack_index`` rationale).
    """
    if checkpoint_input:
        ds = ds.materialize()

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        x = df[val_col].astype(np.float64)
        g = pd.DataFrame(
            {
                key_col: df[key_col],
                "n": np.ones(len(df), np.float64),
                "sx": x,
                "sxx": x * x,
            }
        ).groupby(key_col, as_index=False)
        return g.sum()

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .sum(["n", "sx", "sxx"])
        .to_pandas()
    )
    merged.columns = [key_col, "n", "sx", "sxx"]
    n = merged["n"].to_numpy()
    mean = merged["sx"].to_numpy() / n
    var = merged["sxx"].to_numpy() / n - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    stats_ref = ray.put(
        {
            k: (m, s)
            for k, m, s in zip(merged[key_col], mean, std)
        }
    )

    def apply_z(df: "pd.DataFrame") -> "pd.DataFrame":
        st = ray.get(stats_ref)
        keys = df[key_col].to_numpy()
        mu = np.fromiter((st[k][0] for k in keys), np.float64, len(keys))
        sd = np.fromiter((st[k][1] for k in keys), np.float64, len(keys))
        x = df[val_col].to_numpy(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (x - mu) / sd, 0.0)
        v = z * 100.0
        e2 = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return pd.DataFrame(
            {id_col: df[id_col], key_col: df[key_col], "z_e2": e2}
        )

    return ds.map_batches(apply_z, batch_format="pandas")


def json_int_field(
    ds: "ray.data.Dataset",
    json_col: str,
    field: str,
    id_col: str,
    out_col: str = "v",
) -> "ray.data.Dataset":
    """Extract a flat integer field from a JSON string column —
    vectorized with the Arrow C++ regex kernel (``extract_regex``), no
    per-row ``json.loads`` in the hot path.

    Scope: FLAT unescaped fields (``{"k": 42, ...}``), the
    event-properties shape; nested objects / escaped keys should route
    through an actor-pool ``json.loads`` stage instead (the crawl's
    ``__NEXT_DATA__`` extractor in ``functions/html_text.py`` is that
    path).  Rows without the field yield null.
    """
    import pyarrow.compute as pc_

    pattern = '"' + re.escape(field) + r'"\s*:\s*(?P<v>-?\d+)'

    def extract(batch: pa.Table) -> pa.Table:
        ext = pc_.extract_regex(
            batch[json_col].combine_chunks(), pattern
        )
        v = pc_.cast(pc_.struct_field(ext, "v"), pa.int64())
        return pa.table({id_col: batch[id_col], out_col: v})

    return ds.map_batches(extract, batch_format="pyarrow")


def corr_matrix_e6(
    ds: "ray.data.Dataset",
    cols: list,
) -> "pd.DataFrame":
    """All pairwise Pearson correlations of integer columns in ONE
    pass, 1e-6 fixed point — exactly.

    Each batch reduces to a single row of integer sufficient stats
    (n, Σx per column, Σxy per ordered pair); the merged sums are
    EXACT (int64 on the wire, Python bigints for the n·Σxy products,
    which overflow int64 at corpus scale), so both engines derive the
    corr from identical integers and the only floats are one sqrt and
    one divide — unlike a float-accumulated corr, batching order can't
    move the result.

    Returns a tiny DataFrame (col_a, col_b, corr_e6), a < b in ``cols``
    order.

    Range contract: the CALLER picks units so that
    ``n_rows * max(|x|)^2 < 2^63`` — the partial/merged sums ride int64
    Arrow columns (the driver-side products are bigint-exact).  At
    1e12-row scale, switch the accumulators to the hi/lo int64 carry
    pattern used by substr_dedup's 128-bit rolling hash.
    """
    import math

    k = len(cols)
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        vals = [df[c].to_numpy(dtype=np.int64) for c in cols]
        row = {"n": np.int64(len(df))}
        for i, c in enumerate(cols):
            row[f"s_{i}"] = vals[i].sum()
            row[f"ss_{i}"] = (vals[i] * vals[i]).sum()
        for i, j in pairs:
            row[f"sp_{i}_{j}"] = (vals[i] * vals[j]).sum()
        return pd.DataFrame([row])

    stat_cols = (
        ["n"]
        + [f"s_{i}" for i in range(k)]
        + [f"ss_{i}" for i in range(k)]
        + [f"sp_{i}_{j}" for i, j in pairs]
    )
    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .sum(stat_cols)
    )
    # ray .sum over a whole dataset returns a dict of python ints
    get = lambda name: int(merged[f"sum({name})"])
    n = get("n")
    out = []
    for i, j in pairs:
        sx, sy = get(f"s_{i}"), get(f"s_{j}")
        sxx, syy, sxy = get(f"ss_{i}"), get(f"ss_{j}"), get(f"sp_{i}_{j}")
        cov = n * sxy - sx * sy  # exact bigint
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            e6 = None
        else:
            e6 = int(
                round(
                    float(cov)
                    / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
                    * 1e6
                )
            )
        out.append((cols[i], cols[j], e6))
    res = pd.DataFrame(out, columns=["col_a", "col_b", "corr_e6"])
    res["corr_e6"] = res["corr_e6"].astype("int64")
    return res


def ohlc_daily(
    ds: "ray.data.Dataset",
    key_cols: list[str] = None,
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    val_col: str = "cents",
) -> "ray.data.Dataset":
    """OHLC bars per key: open/close are the values at the first/last
    (ts, id) order position, high/low the extremes, plus a row count.

    Order-dependent aggregates are NOT plain combiners, but they ARE
    mergeable once the partial carries its extreme's order key: each
    batch emits one row per key with (first-key ts/id/value, last-key
    ts/id/value, min, max, count); the merge re-picks the extremes
    lexicographically.  The shuffle carries one partial row per
    (batch, key) — never events.
    """
    key_cols = key_cols or ["day", "event_type"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                columns=key_cols
                + ["o_ts", "o_id", "o_v", "c_ts", "c_id", "c_v",
                   "hi", "lo", "n"]
            )
        df = df.sort_values([*key_cols, ts_col, id_col], kind="mergesort")
        g = df.groupby(key_cols, sort=False)
        first = g.head(1).set_index(key_cols)
        last = g.tail(1).set_index(key_cols)
        agg = g.agg(
            hi=(val_col, "max"), lo=(val_col, "min"), n=(val_col, "size")
        )
        out = pd.DataFrame(
            {
                "o_ts": first[ts_col], "o_id": first[id_col],
                "o_v": first[val_col],
                "c_ts": last[ts_col], "c_id": last[id_col],
                "c_v": last[val_col],
                "hi": agg["hi"], "lo": agg["lo"], "n": agg["n"],
            }
        ).reset_index()
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        o = df.sort_values(["o_ts", "o_id"], kind="mergesort").head(1)
        c = df.sort_values(["c_ts", "c_id"], kind="mergesort").tail(1)
        return pd.DataFrame(
            {
                **{k: o[k].to_numpy() for k in key_cols},
                "open_cents": o["o_v"].to_numpy().astype("int64"),
                "high_cents": [int(df["hi"].max())],
                "low_cents": [int(df["lo"].min())],
                "close_cents": c["c_v"].to_numpy().astype("int64"),
                "n": [int(df["n"].sum())],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_cols)
        .map_groups(merge, batch_format="pandas")
    )
