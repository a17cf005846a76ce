"""Extraction stage: fetched pages -> extracted articles.

The reference hard-codes one extraction routine per exchange class
(SURVEY.md §2.3 M1-M6); here profiles are *data* — a host-profile
registry consumed by one generic vectorized ``map_batches`` stage
(SURVEY.md §2.7's "profiles are data, stages are the only code").

A profile picks:
* the content root (``div.article-body`` / ``div.article-content`` /
  ``<article>`` / whole page — reference ``exchange/bingx.py:243-252``,
  ``exchange/bitunix.py:96-106``, ``exchange/okx.py:102-108``),
* the text variant (A: ``base_scraper.py:271-285``,
  B: ``bingx.py:190-224``).

The stage also normalizes ``warc_ts`` to the HK-local release-time
string (M7) and applies the recency window with tombstones (M8/K3):
skipped-by-window urls still produce a row (``status='tombstone'``,
empty text) — the reference writes those as skip-JSONs
(``exchange/binance.py:242-243``) and they stay in the seen set.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..functions import html_text
from ..functions.canonical import host_of, md5_id
from ..functions.timefmt import recency_cutoff, to_hk_string_array


@dataclass(frozen=True)
class ExtractProfile:
    variant: str = "a"  # 'a' | 'b'
    root_tag: str | None = None
    root_class: str | None = None
    exchange: str | None = None  # default: first dns label of the host
    # JSON detail pages (reference bybit.py:81-102): extract from the
    # __NEXT_DATA__ articleDetail projection when present; pages
    # without one (e.g. the host's hub) fall through to the HTML path
    json_detail: bool = False


_EXCLUDE_A = ("script", "style")
_EXCLUDE_B = ("script", "style", "nav", "header", "footer")

DEFAULT_PROFILE = ExtractProfile()


def extract_with_profile(html: str, profile: ExtractProfile) -> str:
    if profile.json_detail and "__NEXT_DATA__" in html:
        detail = html_text.article_detail_from_next_data(
            html_text.get_next_data(html)
        )
        if detail is not None:
            title, paras = detail
            sep = "\n" if profile.variant == "a" else " "
            body = " ".join(paras)
            return f"{title}{sep}{body}" if body else title
    if profile.root_tag is not None:
        exclude = _EXCLUDE_A if profile.variant == "a" else _EXCLUDE_B
        root_text = html_text.get_text_in_root(
            html, profile.root_tag, profile.root_class, exclude=exclude
        )
        if root_text is not None:
            # reference: str(found_div) piped through the variant's
            # whitespace pipeline (bingx.py:246-248)
            if profile.variant == "a":
                return "\n".join(
                    c for c in html_text._clean_chunks(root_text) if c
                )
            text = " ".join(c for c in html_text._clean_chunks(root_text) if c)
            text = html_text._RE_NL.sub("\n", text)
            text = html_text._RE_WS.sub(" ", text)
            return text.strip()
        # reference falls back to the whole page when the root is
        # missing (bingx.py:249-252)
    if profile.variant == "a":
        return html_text.extract_text_a(html)
    return html_text.extract_text_b(html)


def article_id_of(url: str) -> str:
    """Site id when the url carries one (last path segment), else md5(url)
    (reference id-derivation, ``exchange/weex.py:145``)."""
    path = url.split("?", 1)[0].rstrip("/")
    seg = path.rsplit("/", 1)[-1]
    if seg and seg not in ("hub",):
        return seg if "?" not in url else md5_id(url)
    return md5_id(url)


class ExtractStage:
    """Callable-class stage for ``map_batches``: the profile registry is
    built once per actor in ``__init__`` (not per batch)."""

    def __init__(
        self,
        profiles: dict | None = None,
        as_of_hk: str | None = None,
        offset_days: int = 7,
    ):
        self.profiles = profiles or {}
        self.cutoff = (
            recency_cutoff(as_of_hk, offset_days) if as_of_hk else None
        )

    def profile_for(self, host: str) -> ExtractProfile:
        return self.profiles.get(host, DEFAULT_PROFILE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        titles = (
            batch["title"].to_pylist()
            if "title" in batch.column_names
            else [""] * len(urls)
        )
        release = to_hk_string_array(
            batch["warc_ts"].combine_chunks()
        ).to_pylist()

        exchanges, ids, texts, statuses = [], [], [], []
        for url, html, rel in zip(urls, htmls, release):
            host = host_of(url)
            prof = self.profile_for(host)
            exchanges.append(prof.exchange or host.split(".", 1)[0])
            ids.append(article_id_of(url))
            if self.cutoff is not None and rel is not None and rel < self.cutoff:
                # recency window: string comparison of HK-formatted
                # timestamps, exactly as the reference (binance.py:240)
                texts.append("")
                statuses.append("tombstone")
                continue
            if html is None:
                texts.append("")
                statuses.append("miss")
                continue
            try:
                texts.append(
                    extract_with_profile(html.decode("utf-8", "replace"), prof)
                )
                statuses.append("ok")
            except Exception:
                # dead-letter row, not a dropped record: the reference
                # swallows per-announcement errors silently
                # (exchange/binance.py:286-288); here failures stay
                # visible and countable downstream
                texts.append("")
                statuses.append("error")

        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "exchange": pa.array(exchanges, pa.string()),
                "article_id": pa.array(ids, pa.string()),
                "title": pa.array(titles, pa.string()),
                "release_time": pa.array(release, pa.string()),
                "text": pa.array(texts, pa.string()),
                "status": pa.array(statuses, pa.string()),
            }
        )


def profiles_for_sources(sources) -> dict:
    """Host-profile registry for the synthetic web (sources/pages.py):
    source index % 3 -> 0: whole-page variant A, 1: article-body + B,
    2: article-content + B; hosts with source index % 4 == 3
    additionally serve JSON detail pages (__NEXT_DATA__ articleDetail,
    reference bybit.py:81-102) — same extracted text, different
    transport."""
    from ..sources.pages import host_for, src_num

    out = {}
    for s in sources:
        jd = src_num(s) % 4 == 3
        m = src_num(s) % 3
        if m == 0:
            out[host_for(s)] = ExtractProfile(
                variant="a", exchange=s, json_detail=jd
            )
        elif m == 1:
            out[host_for(s)] = ExtractProfile(
                variant="b",
                root_tag="div",
                root_class="article-body",
                exchange=s,
                json_detail=jd,
            )
        else:
            out[host_for(s)] = ExtractProfile(
                variant="b",
                root_tag="div",
                root_class="article-content",
                exchange=s,
                json_detail=jd,
            )
    return out
