"""Timestamp normalization + recency-window semantics.

The reference normalizes every site's timestamp encoding (epoch ms,
epoch s, ISO strings, ``<time datetime>``) to an Asia/Hong_Kong local
string ``%Y-%m-%d %H:%M:%S`` (reference ``exchange/binance.py:239``,
``exchange/gate.py:81``, ``exchange/mexc.py:125`` …) and then applies the
recency window by **comparing formatted strings** (reference
``exchange/binance.py:240-244``) — lexicographic, which for this fixed
format equals chronological order.  Hong Kong has no DST, so the
conversion is a constant +8h offset; we exploit that to keep the hot
path a pure Arrow compute expression (no per-row tz objects).
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc

HK_OFFSET_US = 8 * 3600 * 1_000_000
HK_TZ = _dt.timezone(_dt.timedelta(hours=8))
FMT = "%Y-%m-%d %H:%M:%S"


def to_hk_string_array(ts: pa.Array) -> pa.Array:
    """timestamp array (assumed UTC, any unit) -> HK-local formatted strings.

    Vectorized: cast to us, add the fixed offset, strftime.
    """
    ts_us = pc.cast(ts, pa.timestamp("us"))
    shifted = pc.add(
        pc.cast(ts_us, pa.int64()), pa.scalar(HK_OFFSET_US, pa.int64())
    )
    # truncate to second precision: Arrow's %S on sub-second timestamps
    # emits fractional digits, the reference's pandas strftime does not
    secs = pc.divide(shifted, pa.scalar(1_000_000, pa.int64()))
    return pc.strftime(pc.cast(secs, pa.timestamp("s")), format=FMT)


def hk_string(ts_utc: _dt.datetime) -> str:
    """Scalar helper for the same conversion."""
    if ts_utc.tzinfo is None:
        ts_utc = ts_utc.replace(tzinfo=_dt.timezone.utc)
    return ts_utc.astimezone(HK_TZ).strftime(FMT)


def recency_cutoff(as_of_hk: str, offset_days: int) -> str:
    """The reference's window cutoff: ``now(HK) - offset_days`` formatted,
    compared as a string against release-time strings (reference
    ``exchange/binance.py:240``).  ``as_of_hk`` replaces ``now()`` so runs
    are deterministic."""
    base = _dt.datetime.strptime(as_of_hk, FMT)
    return (base - _dt.timedelta(days=offset_days)).strftime(FMT)


def epoch_ms_to_hk(ms: int) -> str:
    return hk_string(_dt.datetime.fromtimestamp(ms / 1000, _dt.timezone.utc))


def epoch_s_to_hk(s: float) -> str:
    return hk_string(_dt.datetime.fromtimestamp(s, _dt.timezone.utc))


def iso_to_hk(iso: str) -> str:
    return hk_string(_dt.datetime.fromisoformat(iso))
