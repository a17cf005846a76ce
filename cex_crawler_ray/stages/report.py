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

All distributed batch functions run on zero-copy Arrow tables with
``pyarrow.compute`` string kernels; the only pandas left is the
driver-side pivot over the (days x exchanges)-sized grouped result,
imported locally where it runs.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc

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


def _clean_batch(t: pa.Table, today_str: str) -> pa.Table:
    """A2 filter chain (``main.py:56-66``), Arrow kernels per batch.

    Null semantics match the pandas original: a null ``time`` passes
    the != '待定' filter; null symbol/action rows drop."""
    time = t["time"]
    action = t["action"]
    keep = pc.and_(
        pc.and_(
            pc.fill_null(pc.not_equal(time, "待定"), True),
            pc.is_valid(t["symbol"]),
        ),
        pc.fill_null(pc.not_equal(action, ""), False),
    )
    t = t.filter(keep)
    time = t["time"]
    short = pc.or_kleene(
        pc.is_null(time), pc.less(pc.utf8_length(time), 10)
    )
    comments = pc.if_else(short, "待确定", "")
    fixed_time = pc.if_else(short, today_str, time)
    t = t.set_column(
        t.schema.get_field_index("time"), "time", fixed_time
    )
    if "comments" in t.column_names:
        t = t.set_column(
            t.schema.get_field_index("comments"), "comments", comments
        )
    else:
        t = t.append_column("comments", comments)
    return t


def _description(t: pa.Table) -> pa.Array:
    """A6 (``main.py:77``): comments + action + ' ' + symbol stripped of
    USDT quote + newline — one element-wise binary join."""
    sym = pc.replace_substring(
        pc.replace_substring(t["symbol"], "/USDT", ""), "USDT", ""
    )
    return pc.binary_join_element_wise(
        t["comments"], t["action"], " ", sym, "\n", ""
    )


def build_report(
    records_ds: "ray.data.Dataset",
    as_of: str,
    spot_cex: list,
    futures_cex: list,
    offset_days: int = 14,
):
    """records Dataset -> {'full': Dataset, 'spot': df, 'futures': df}.

    The wide work (filters, fills, description) streams through
    ``map_batches`` on Arrow; the group-concat is a ``groupby(time,
    exchange)`` ``map_groups``; the pivot runs on the driver over the
    (tiny) grouped result, like the reference's in-memory pivot
    (``main.py:81-84``).
    """
    today = _dt.date.fromisoformat(as_of)
    today_str = today.isoformat()
    start_date = (today - _dt.timedelta(days=7)).isoformat()
    release_floor = (today - _dt.timedelta(days=offset_days)).isoformat()

    cleaned = records_ds.map_batches(
        lambda t: _clean_batch(t, today_str), batch_format="pyarrow"
    )

    # A4 global sort (release_date desc, exchange desc + deterministic
    # tie-break); Ray ds.sort is the distributed path for big tables
    def add_release_date(t: pa.Table) -> pa.Table:
        return t.append_column(
            "release_date",
            pc.utf8_slice_codeunits(t["release_time"], 0, 10),
        )

    full = (
        cleaned.map_batches(add_release_date, batch_format="pyarrow")
        .sort(
            ["release_date", "exchange", "release_time", "url"],
            descending=[True, True, True, False],
        )
        .drop_columns(["release_date"])
        .select_columns(FULL_COLUMNS)
    )

    # A5 windows + A6 description
    def windowed(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.fill_null(pc.greater_equal(t["time"], start_date), False),
            pc.fill_null(
                pc.greater_equal(t["release_time"], release_floor), False
            ),
        )
        t = t.filter(keep)
        return t.append_column(
            "description", _description(t)
        ).append_column(
            "release_date",
            pc.utf8_slice_codeunits(t["release_time"], 0, 10),
        )

    win = cleaned.map_batches(windowed, batch_format="pyarrow")

    def grouped(ds, cexes, market):
        cexset = pa.array(list(cexes), pa.string())

        def market_filter(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.and_(
                    pc.fill_null(pc.equal(t["type"], market), False),
                    pc.fill_null(
                        pc.is_in(t["exchange"], value_set=cexset), False
                    ),
                )
            )

        sub = ds.map_batches(market_filter, batch_format="pyarrow")

        def concat_group(t: pa.Table) -> pa.Table:
            t = t.sort_by(
                [
                    ("release_date", "descending"),
                    ("release_time", "descending"),
                    ("url", "ascending"),
                    ("symbol", "ascending"),
                ]
            )
            return pa.table(
                {
                    "time": t["time"].slice(0, 1),
                    "exchange": t["exchange"].slice(0, 1),
                    "description": pa.array(
                        [" ".join(t["description"].to_pylist())],
                        pa.string(),
                    ),
                }
            )

        return sub.groupby(["time", "exchange"]).map_groups(
            concat_group, batch_format="pyarrow"
        )

    spot_g = grouped(win, spot_cex, "现货")
    fut_g = grouped(win, futures_cex, "合约")

    def pivot(grouped_ds, cexes):
        # A9: the grouped result is small (days x exchanges); driver-side
        # pandas pivot like the reference (main.py:81-84) — the one
        # deliberate pandas use in this layer
        import pandas as pd

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
