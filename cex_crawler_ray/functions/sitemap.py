"""sitemaps.org XML parsing (crawl-side).

A sitemap is either a ``<urlset>`` of page ``<loc>`` entries or a
``<sitemapindex>`` of nested sitemap ``<loc>`` entries (one level of
indirection in the standard; indexes may nest, so the crawler bounds
recursion).  The reference crawler discovers URLs only from site list
APIs (reference ``exchange/binance.py:75-136`` etc.); sitemap discovery
is the standard-web equivalent a Common-Crawl-style engine needs.
"""

from __future__ import annotations

import re

_LOC_RE = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>")


def parse_sitemap(xml: str) -> tuple[list, list]:
    """Return (page_urls, nested_sitemap_urls).

    ``<sitemapindex>`` documents yield only nested urls; ``<urlset>``
    documents yield only page urls.  Regex-on-loc is the standard
    fast path (the element grammar is fixed); malformed bodies yield
    whatever well-formed ``<loc>`` entries they contain.
    """
    locs = _LOC_RE.findall(xml)
    if "<sitemapindex" in xml:
        return [], locs
    return locs, []
