"""Analyzer stage: extracted announcements -> flat `records` rows.

Reference flow: per announcement, ``DeepSeekAnalyzer.analyze_announcement``
(LLM, ``deepseek_analyzer.py:64-102``) falling back to keyword analysis,
then ``save_analysis_result`` flattens listings+delistings and merges
crawl metadata into one JSON per announcement
(``deepseek_analyzer.py:225-242``).

Here: one stateless vectorized ``map_batches`` running the deterministic
fallback analyzer (functions/analyzer.py) and exploding one announcement
row into N record rows (the reference's list-of-dicts becomes a flat
Arrow table — SURVEY.md §2.5 M19-M21).  Tombstone announcements (recency
-skipped) become records rows with null symbol/action, mirroring the
reference's skip-JSONs which the report layer later drops via the
``symbol notna`` filter (``main.py:66``).

An LLM-backed analyzer would slot in as a callable-class actor pool
(``map_batches(LLMAnalyzer, concurrency=N)``, client built in
``__init__``) — pluggable, out of the deterministic conformance path.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.analyzer import (
    fallback_analysis,
    flatten_result,
    validate_and_clean,
)
from ..schemas import RECORDS


def analyze_batch(batch: pa.Table) -> pa.Table:
    out = {name: [] for name in RECORDS.names}

    def emit(entry: dict):
        for name in RECORDS.names:
            out[name].append(entry.get(name))

    for url, exchange, title, release_time, text, status in zip(
        batch["url"].to_pylist(),
        batch["exchange"].to_pylist(),
        batch["title"].to_pylist(),
        batch["release_time"].to_pylist(),
        batch["text"].to_pylist(),
        batch["status"].to_pylist(),
    ):
        meta = {
            "exchange": exchange,
            "title": title,
            "url": url,
            "release_time": release_time,
            "content": text,
        }
        if status == "tombstone":
            # reference tombstone record: {release_time, text:'', url,
            # title, exchange} (exchange/binance.py:242-243)
            emit(meta)
            continue
        if status != "ok":
            continue
        result = validate_and_clean(fallback_analysis(text))
        for item in flatten_result(result, meta):
            emit(item)
    return pa.Table.from_pydict(out, schema=RECORDS)


def records_from_extracted(extracted_ds):
    """extracted Dataset -> records Dataset (hub/list pages excluded:
    they carry no announcement id — the reference only analyzes detail
    pages)."""
    return extracted_ds.map_batches(analyze_batch, batch_format="pyarrow")


# The reference's LLM request contract (deepseek_analyzer.py:27-102),
# re-derived as data so a production client reproduces the call
# without this repo shipping a network dependency: one chat
# completion per announcement, deterministic-ish decoding, a JSON-only
# reply in the fallback analyzer's schema (validate_and_clean accepts
# exactly this shape, so LLM and fallback outputs are interchangeable
# downstream).
LLM_REQUEST_PARAMS = {
    "temperature": 0.1,  # deepseek_analyzer.py:88
    "max_tokens": 1000,  # deepseek_analyzer.py:89
}


def llm_prompt_for(text: str, max_chars: int = 4000) -> str:
    """Prompt builder for a production client: ask for strict JSON in
    the analyzer schema.  Semantics per the reference's zh prompt
    (announcement -> listings/delistings with symbol, action
    上架/下架, type 现货/合约, time), re-expressed; the reply feeds
    ``fix_json_response`` -> ``validate_and_clean`` unchanged."""
    return (
        "分析以下交易所公告，找出上架(listing)和下架(delisting)的"
        "交易对。只返回JSON，格式：{\"listings\": [{\"symbol\": ..., "
        "\"action\": \"上架\", \"type\": \"现货\"或\"合约\", "
        "\"time\": ...}], \"delistings\": [...]}。公告内容：\n"
        + text[:max_chars]
    )


class LLMAnalyzerStage:
    """Actor-pool analyzer: the reference's LLM path
    (``deepseek_analyzer.py:64-102``: chat completion, temperature 0.1,
    max_tokens 1000, JSON reply -> repair -> validate) as a stateful
    ``map_batches`` class.

    The client is injected via ``client_factory`` (built ONCE per actor
    in ``__init__``) so the stage is testable and the sandbox (no
    network) runs the deterministic fallback.  Use::

        extracted.map_batches(LLMAnalyzerStage,
                              fn_constructor_kwargs={"client_factory": f},
                              batch_size=32, concurrency=(2, 8),
                              batch_format="pyarrow")

    A client is any callable ``text -> str`` returning the model reply.
    On any client error the stage falls back to keyword analysis, like
    the reference (``deepseek_analyzer.py:96-102``).
    """

    def __init__(self, client_factory=None):
        self.client = client_factory() if client_factory else None

    def _analyze(self, text: str) -> dict:
        import json

        from ..functions.analyzer import fix_json_response

        if self.client is None:
            return fallback_analysis(text)
        try:
            reply = self.client(text)
            try:
                return json.loads(reply)
            except Exception:
                return fix_json_response(reply)
        except Exception:
            return fallback_analysis(text)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in RECORDS.names}

        def emit(entry: dict):
            for name in RECORDS.names:
                out[name].append(entry.get(name))

        for url, exchange, title, release_time, text, status in zip(
            batch["url"].to_pylist(),
            batch["exchange"].to_pylist(),
            batch["title"].to_pylist(),
            batch["release_time"].to_pylist(),
            batch["text"].to_pylist(),
            batch["status"].to_pylist(),
        ):
            meta = {
                "exchange": exchange,
                "title": title,
                "url": url,
                "release_time": release_time,
                "content": text,
            }
            if status == "tombstone":
                emit(meta)
                continue
            if status != "ok":
                continue
            result = validate_and_clean(self._analyze(text))
            for item in flatten_result(result, meta):
                emit(item)
        return pa.Table.from_pydict(out, schema=RECORDS)
