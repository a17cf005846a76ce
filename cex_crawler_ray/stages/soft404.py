"""Soft-404 detection: pages served with HTTP 200 whose CONTENT is an
error page ("page not found", empty shells, stub bodies).

Crawlers must catch these before the content enters the corpus or the
frontier learns from their links — a host serving its 404 page with
status 200 otherwise poisons dedup (thousands of identical "not
found" bodies), quality stats, and link discovery.  Production
crawlers (Heritrix's SoftRetryMidFetch, Common Crawl's post-filters)
classify by content heuristics exactly like these; the reference
engine's Cloudflare-challenge sniff (`exchange/base_scraper.py`
retry-on-challenge loop) is the same idea pointed at a different
failure page.

``classify_soft404`` is a pure vectorized Arrow kernel (lowercase →
regex title extract → substring matches → length test), zero shuffle,
deterministic reason priority:

  title_404  — the <title> matches 404 / not found / error
  phrase     — the body carries a not-found phrase
  tiny       — the body is shorter than ``min_len`` characters
  ""         — a real page
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TITLE_RE = r"<title>(?P<t>[^<]*)</title>"
_TITLE_BAD_RE = r"(404|not found|error)"
_PHRASES = (
    "page not found",
    "page does not exist",
    "no longer available",
)
_DEFAULT_MIN_LEN = 64


def classify_soft404(
    pages,
    text_col: str = "html",
    status_col: str | None = "status",
    min_len: int = _DEFAULT_MIN_LEN,
):
    """Append (is_soft404: bool, soft404_reason: string) to ``pages``.
    Only rows with status 200 (or every row when ``status_col`` is
    None) are candidates — a hard 404 is already handled by the fetch
    layer."""

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(
            col.type
        ):
            col = pc.cast(col, pa.string())
        low = pc.utf8_lower(pc.fill_null(col, ""))

        title = pc.extract_regex(low, _TITLE_RE)
        title_txt = pc.fill_null(pc.struct_field(title, "t"), "")
        title_bad = pc.match_substring_regex(title_txt, _TITLE_BAD_RE)

        phrase = pa.array([False] * batch.num_rows, pa.bool_())
        phrase = pa.chunked_array([phrase])
        for p in _PHRASES:
            phrase = pc.or_(phrase, pc.match_substring(low, p))

        tiny = pc.less(pc.utf8_length(low), pa.scalar(min_len))

        if status_col is not None:
            ok200 = pc.equal(batch[status_col], pa.scalar(200))
        else:
            ok200 = pa.chunked_array(
                [pa.array([True] * batch.num_rows, pa.bool_())]
            )

        reason = pc.if_else(
            pc.and_(ok200, title_bad),
            pa.scalar("title_404"),
            pc.if_else(
                pc.and_(ok200, phrase),
                pa.scalar("phrase"),
                pc.if_else(
                    pc.and_(ok200, tiny),
                    pa.scalar("tiny"),
                    pa.scalar(""),
                ),
            ),
        )
        is_soft = pc.not_equal(reason, pa.scalar(""))
        return batch.append_column(
            "is_soft404", is_soft.combine_chunks()
            if isinstance(is_soft, pa.ChunkedArray) else is_soft
        ).append_column(
            "soft404_reason", reason.combine_chunks()
            if isinstance(reason, pa.ChunkedArray) else reason
        )

    return pages.map_batches(kernel, batch_format="pyarrow")
