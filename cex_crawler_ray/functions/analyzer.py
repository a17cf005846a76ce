"""Deterministic announcement analyzer — from-scratch reimplementation of
the reference's keyword fallback path.

Semantics source (conformance surface):

* keyword classification + symbol/time regexes + type rules:
  reference ``deepseek_analyzer.py:149-199`` (``_fallback_analysis``)
* result validation / defaulting: reference ``deepseek_analyzer.py:104-133``
* flatten listings+delistings and merge crawl metadata:
  reference ``deepseek_analyzer.py:233-235`` (``save_analysis_result``)

The LLM path (reference ``deepseek_analyzer.py:64-102``) is a pluggable
actor-pool stage in stages/analyze.py; in-sandbox the deterministic
fallback below IS the analyzer, so results are reproducible.
"""

from __future__ import annotations

import re

LISTING_KEYWORDS = ["上架", "上线", "新增", "开放交易", "开始交易", "listing"]
DELISTING_KEYWORDS = ["下架", "下线", "停止交易", "终止交易", "delisting", "removal"]

_SYMBOL_RE = re.compile(r"[A-Z]{2,10}/[A-Z]{2,10}|[A-Z]{2,10}-[A-Z]{2,10}")
_TIME_RE = re.compile(r"\d{4}年\d{1,2}月\d{1,2}日|\d{4}-\d{1,2}-\d{1,2}")

_FUTURES_WORDS = ["合约", "永续", "futures", "perpetual"]
_SPOT_WORDS = ["现货", "spot"]


def determine_type(text: str) -> str:
    """reference ``deepseek_analyzer.py:171-178``: futures words win,
    else spot words, else default spot."""
    text_lower = text.lower()
    if any(w in text_lower for w in _FUTURES_WORDS):
        return "合约"
    if any(w in text_lower for w in _SPOT_WORDS):
        return "现货"
    return "现货"


def fallback_analysis(text_content: str) -> dict:
    """Keyword analysis of one announcement text.

    Returns ``{"listings": [...], "delistings": [...]}`` with entries
    ``{symbol, action, type, time}`` — exact reference semantics
    (``deepseek_analyzer.py:149-199``): at most 3 symbols per side, first
    time match or the '时间未明确' sentinel, substring keyword checks on
    the lowercased text (note: 'delisting' contains 'listing', so a
    delisting announcement emits BOTH sides, as in the reference).
    """
    result = {"listings": [], "delistings": []}
    text_lower = text_content.lower()
    symbols = _SYMBOL_RE.findall(text_content.upper())
    times = _TIME_RE.findall(text_content)
    time_val = times[0] if times else "时间未明确"

    if any(k in text_lower for k in LISTING_KEYWORDS):
        for symbol in symbols[:3]:
            result["listings"].append(
                {
                    "symbol": symbol,
                    "action": "上架",
                    "type": determine_type(text_content),
                    "time": time_val,
                }
            )
    if any(k in text_lower for k in DELISTING_KEYWORDS):
        for symbol in symbols[:3]:
            result["delistings"].append(
                {
                    "symbol": symbol,
                    "action": "下架",
                    "type": determine_type(text_content),
                    "time": time_val,
                }
            )
    return result


def validate_and_clean(result: dict) -> dict:
    """Schema enforcement + defaulting (reference
    ``deepseek_analyzer.py:104-133``)."""
    result.setdefault("listings", [])
    result.setdefault("delistings", [])
    for entry, action in (
        *((e, "上架") for e in result["listings"]),
        *((e, "下架") for e in result["delistings"]),
    ):
        if not all(k in entry for k in ("symbol", "action", "type", "time")):
            entry.setdefault("action", action)
            entry.setdefault("type", "现货")
            entry.setdefault("time", "时间未明确")
    return result


def flatten_result(result: dict, updates: dict | None = None) -> list:
    """listings + delistings, each merged with crawl metadata
    (reference ``deepseek_analyzer.py:233-235``)."""
    all_results = result.get("listings", []) + result.get("delistings", [])
    if updates:
        all_results = [{**item, **updates} for item in all_results]
    return all_results


_JSON_RE = re.compile(r"\{.*\}", re.DOTALL)


def fix_json_response(response: str) -> dict:
    """JSON repair for an LLM reply (reference
    ``deepseek_analyzer.py:135-147``): extract the outermost {...} span,
    reparse, empty result on failure."""
    import json

    m = _JSON_RE.search(response)
    if m:
        try:
            return json.loads(m.group())
        except Exception:
            pass
    return {"listings": [], "delistings": []}
