"""Report layer: records -> consolidated table + spot/futures pivots.

Faithful Ray Data re-expression of the reference's CSV merge
(``main.py:42-95``), SURVEY.md §2.6 A1-A10, with two deliberate changes:

* ``now()`` is replaced by an explicit ``as_of`` date so runs are
  deterministic (the reference's window shifts every day),
* in-group concat order: the reference sorts by (release_date desc,
  exchange desc) and then relies on glob file order for ties
  (nondeterministic); here ties break deterministically by
  (release_time desc, url asc, symbol asc).

Duplicate-column quirk: the reference selects ``content`` twice
(``main.py:65``); we keep a single ``content`` column.
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd

import ray

FULL_COLUMNS = [
    "release_time",
    "time",
    "exchange",
    "symbol",
    "type",
    "action",
    "title",
    "url",
    "content",
    "comments",
]


def _clean_batch(df: pd.DataFrame, today_str: str) -> pd.DataFrame:
    """A2 filter chain (``main.py:56-66``), vectorized per batch."""
    df = df[df["time"] != "待定"]
    df = df[
        df["symbol"].notna()
        & (df["action"] != "")
        & df["action"].notna()
    ].copy()
    short = df["time"].isna() | (df["time"].str.len() < 10)
    df["comments"] = ""
    df.loc[short, "comments"] = "待确定"
    df.loc[short, "time"] = today_str
    return df


def _description(df: pd.DataFrame) -> pd.Series:
    """A6 (``main.py:77``): comments + action + ' ' + symbol stripped of
    USDT quote + newline."""
    sym = df["symbol"].str.replace("/USDT", "", regex=False).str.replace(
        "USDT", "", regex=False
    )
    return df["comments"] + df["action"] + " " + sym + "\n"


def build_report(
    records_ds: "ray.data.Dataset",
    as_of: str,
    spot_cex: list,
    futures_cex: list,
    offset_days: int = 14,
):
    """records Dataset -> {'full': Dataset, 'spot': df, 'futures': df}.

    The wide work (filters, fills, description) streams through
    ``map_batches``; the group-concat is a ``groupby(time, exchange)``
    ``map_groups``; the pivot runs on the driver over the (tiny) grouped
    result, like the reference's in-memory pivot (``main.py:81-84``).
    """
    today = _dt.date.fromisoformat(as_of)
    today_str = today.isoformat()
    start_date = (today - _dt.timedelta(days=7)).isoformat()
    release_floor = (today - _dt.timedelta(days=offset_days)).isoformat()

    cleaned = records_ds.map_batches(
        lambda df: _clean_batch(df, today_str), batch_format="pandas"
    )

    # A4 global sort (release_date desc, exchange desc + deterministic
    # tie-break); Ray ds.sort is the distributed path for big tables
    def add_release_date(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["release_date"] = df["release_time"].str.slice(0, 10)
        return df

    full = (
        cleaned.map_batches(add_release_date, batch_format="pandas")
        .sort(["release_date", "exchange", "release_time", "url"], descending=[True, True, True, False])
        .drop_columns(["release_date"])
        .select_columns(FULL_COLUMNS)
    )

    # A5 windows + A6 description
    def windowed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["time"] >= start_date]
        df = df[df["release_time"] >= release_floor].copy()
        if len(df):
            df["description"] = _description(df)
            df["release_date"] = df["release_time"].str.slice(0, 10)
        else:
            df["description"] = pd.Series([], dtype=str)
            df["release_date"] = pd.Series([], dtype=str)
        return df

    win = cleaned.map_batches(windowed, batch_format="pandas")

    def grouped(ds, cexes, market):
        cexset = list(cexes)

        def market_filter(df: pd.DataFrame) -> pd.DataFrame:
            return df[(df["type"] == market) & df["exchange"].isin(cexset)]

        sub = ds.map_batches(market_filter, batch_format="pandas")

        def concat_group(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                ["release_date", "release_time", "url", "symbol"],
                ascending=[False, False, True, True],
            )
            return pd.DataFrame(
                {
                    "time": [df["time"].iloc[0]],
                    "exchange": [df["exchange"].iloc[0]],
                    "description": [" ".join(df["description"])],
                }
            )

        return sub.groupby(["time", "exchange"]).map_groups(
            concat_group, batch_format="pandas"
        )

    spot_g = grouped(win, spot_cex, "现货")
    fut_g = grouped(win, futures_cex, "合约")

    def pivot(grouped_ds, cexes) -> pd.DataFrame:
        # A9: the grouped result is small (days x exchanges); driver-side
        # pivot like the reference (main.py:81-84)
        df = grouped_ds.to_pandas()
        if len(df) == 0:
            out = pd.DataFrame(columns=cexes)
            out.index.name = "time"
            return out
        out = df.pivot(index="time", columns="exchange", values="description")
        for ex in cexes:
            if ex not in out.columns:
                out[ex] = ""
        return out

    return {
        "full": full,
        "spot_grouped": spot_g,
        "futures_grouped": fut_g,
        "spot": lambda: pivot(spot_g, spot_cex),
        "futures": lambda: pivot(fut_g, futures_cex),
    }
