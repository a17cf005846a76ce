r"""HTML -> text extraction, reimplemented from scratch on the stdlib.

The reference (r-hou/cex_crawler) extracts announcement text with
BeautifulSoup('html.parser') in two variants:

* variant A — ``BaseScraper.parse_announcement_content``
  (reference ``exchange/base_scraper.py:271-285``): decompose
  ``script``/``style``, ``get_text()``, strip each line, split each line
  on two-space runs, join non-empty chunks with ``"\n"``.
* variant B — ``extract_text_from_html``
  (reference ``exchange/bingx.py:190-224``, duplicated in
  ``exchange/okx.py:66-100``): additionally decompose
  ``nav``/``header``/``footer``, join chunks with ``" "``, collapse
  ``\n+`` then ``\s+``, strip; regex-strip-tags fallback on parse error.

bs4 is NOT a dependency here: ``get_text`` semantics are re-derived on
``html.parser.HTMLParser`` (the same tokenizer bs4's ``html.parser``
tree builder uses), so the per-url extracted text is byte-identical for
well-formed pages.  These are pure functions — the Ray stage wraps them
in a vectorized ``map_batches`` (see ``stages/extract.py``).

Also here: subtree ("content root") selection equivalent to the
reference's ``soup.find('div', class_='article-body')`` pattern
(reference ``exchange/bingx.py:243-252``, ``exchange/bitunix.py:96-106``,
``exchange/okx.py:102-108``), link extraction for frontier discovery
(reference ``exchange/weex.py:30-60`` and peers), ``<pre>``-JSON
extraction (reference ``exchange/base_scraper.py:287-299``) and
``__NEXT_DATA__`` script-JSON extraction (reference
``exchange/bybit.py:54-78`` and 6 near-copies).
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

# HTML void elements: start tags that never get a matching end tag.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# html.parser switches to CDATA mode inside these: content arrives as raw data.
_CDATA = ("script", "style")


class _TextCollector(HTMLParser):
    """Equivalent of soup.decompose(excluded) + soup.get_text().

    Collects character data in document order, skipping the subtrees of
    ``exclude`` tags.  Comments / declarations / PIs are skipped (matching
    modern bs4 ``get_text`` behaviour with the html.parser builder).
    """

    def __init__(self, exclude: frozenset):
        super().__init__(convert_charrefs=True)
        self._exclude = exclude
        self._skip = 0
        self.parts: list = []

    def handle_starttag(self, tag, attrs):
        if tag in self._exclude and tag not in _VOID:
            self._skip += 1

    def handle_startendtag(self, tag, attrs):
        # <tag/> opens and closes immediately: no depth change.
        pass

    def handle_endtag(self, tag):
        if tag in self._exclude and self._skip > 0:
            self._skip -= 1

    def handle_data(self, data):
        if self._skip == 0:
            self.parts.append(data)


def get_text(html: str, exclude=()) -> str:
    """Concatenated character data of ``html`` minus excluded subtrees."""
    p = _TextCollector(frozenset(exclude))
    p.feed(html)
    p.close()
    return "".join(p.parts)


def _clean_chunks(text: str):
    # Shared whitespace pipeline of both variants: per-line strip, then
    # two-space splitting ("  " is the phrase separator the reference uses).
    lines = (line.strip() for line in text.splitlines())
    return (phrase.strip() for line in lines for phrase in line.split("  "))


def extract_text_a(html: str) -> str:
    """Variant A (reference ``exchange/base_scraper.py:271-285``)."""
    if not isinstance(html, str):
        return html
    text = get_text(html, exclude=("script", "style"))
    return "\n".join(c for c in _clean_chunks(text) if c)


_RE_NL = re.compile(r"\n+")
_RE_WS = re.compile(r"\s+")
_RE_TAG = re.compile(r"<[^>]+>")


def extract_text_b(html: str) -> str:
    """Variant B (reference ``exchange/bingx.py:190-224``)."""
    try:
        text = get_text(
            html, exclude=("script", "style", "nav", "header", "footer")
        )
        text = " ".join(c for c in _clean_chunks(text) if c)
        text = _RE_NL.sub("\n", text)
        text = _RE_WS.sub(" ", text)
        return text.strip()
    except Exception:
        # Reference fallback: regex-strip tags, collapse whitespace.
        try:
            text = _RE_TAG.sub("", html)
            return _RE_WS.sub(" ", text).strip()
        except Exception:
            return html


class _RootTextCollector(HTMLParser):
    """get_text of the FIRST element matching (tag, class-contains).

    Equivalent to ``str(soup.find(tag, class_=cls))`` piped through text
    extraction (reference ``exchange/bingx.py:243-252``) but single-pass:
    collects data only inside the first matching subtree, honouring the
    same ``exclude`` skip rule.
    """

    def __init__(self, root_tag: str, root_class, exclude: frozenset):
        super().__init__(convert_charrefs=True)
        self._root_tag = root_tag
        self._root_class = root_class
        self._exclude = exclude
        self._in_root = False
        self._done = False
        self._depth = 0
        self._skip = 0
        self.found = False
        self.parts: list = []

    def _matches(self, tag, attrs) -> bool:
        if tag != self._root_tag:
            return False
        if self._root_class is None:
            return True
        for k, v in attrs:
            if k == "class" and self._root_class in (v or "").split():
                return True
        return False

    def handle_starttag(self, tag, attrs):
        if self._done:
            return
        if not self._in_root:
            if self._matches(tag, attrs):
                self._in_root = True
                self.found = True
                self._depth = 0
            return
        if tag in self._exclude and tag not in _VOID:
            self._skip += 1
        if tag not in _VOID:
            self._depth += 1

    def handle_endtag(self, tag):
        if self._done or not self._in_root:
            return
        if self._depth == 0:
            # closing the root element itself
            self._in_root = False
            self._done = True
            return
        self._depth -= 1
        if tag in self._exclude and self._skip > 0:
            self._skip -= 1

    def handle_data(self, data):
        if self._in_root and not self._done and self._skip == 0:
            self.parts.append(data)


def get_text_in_root(html: str, root_tag: str, root_class, exclude=()):
    """Text of the first ``<root_tag class~=root_class>`` subtree, or None."""
    p = _RootTextCollector(root_tag, root_class, frozenset(exclude))
    p.feed(html)
    p.close()
    if not p.found:
        return None
    return "".join(p.parts)


class _LinkCollector(HTMLParser):
    """Collect (href, anchor-text) pairs — frontier discovery primitive.

    Equivalent of the reference's hub-page ``<a>`` scans
    (``exchange/weex.py:30-60``, ``exchange/bitunix.py:30-74``,
    ``exchange/blofin.py:30-77``).
    """

    def __init__(self, honor_nofollow: bool = True):
        super().__init__(convert_charrefs=True)
        self._href = None
        self._text: list = []
        self.links: list = []
        self._honor_nofollow = honor_nofollow
        self._skip_current = False
        self.meta_nofollow = False  # <meta name=robots content=...nofollow...>

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._flush()
            d = dict(attrs)
            self._href = d.get("href")
            rel = (d.get("rel") or "").lower().split()
            self._skip_current = self._honor_nofollow and "nofollow" in rel
            self._text = []
        elif tag == "meta" and self._honor_nofollow:
            d = {k.lower(): (v or "") for k, v in attrs}
            if d.get("name", "").lower() == "robots" and "nofollow" in d.get(
                "content", ""
            ).lower():
                self.meta_nofollow = True

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def _flush(self):
        if self._href is not None and not self._skip_current:
            self.links.append((self._href, "".join(self._text).strip()))
        self._href = None
        self._skip_current = False
        self._text = []

    def handle_data(self, data):
        if self._href is not None:
            self._text.append(data)


def extract_links(html: str, honor_nofollow: bool = True):
    """All (href, text) anchors in document order.

    ``honor_nofollow`` (default on — a polite crawler's behavior, and
    a no-op on pages without the attribute) drops ``rel=nofollow``
    anchors and returns NO links when the page carries
    ``<meta name="robots" content="...nofollow...">``."""
    p = _LinkCollector(honor_nofollow=honor_nofollow)
    p.feed(html)
    p.close()
    p._flush()
    if p.meta_nofollow:
        return []
    return p.links


class _TagContentCollector(HTMLParser):
    """Raw character data of the first tag matching an attribute filter."""

    def __init__(self, tag: str, attr_filter: dict):
        super().__init__(convert_charrefs=True)
        self._tag = tag
        self._filter = attr_filter
        self._in = False
        self._done = False
        self.found = False
        self.parts: list = []

    def handle_starttag(self, tag, attrs):
        if self._done or self._in or tag != self._tag:
            return
        d = dict(attrs)
        if all(d.get(k) == v for k, v in self._filter.items()):
            self._in = True
            self.found = True

    def handle_endtag(self, tag):
        if self._in and tag == self._tag:
            self._in = False
            self._done = True

    def handle_data(self, data):
        if self._in:
            self.parts.append(data)


def find_tag_content(html: str, tag: str, **attr_filter):
    """Character data of the first ``<tag attr=..>``, or None."""
    p = _TagContentCollector(tag, attr_filter)
    p.feed(html)
    p.close()
    if not p.found:
        return None
    return "".join(p.parts)


def _links_from_json(obj, depth: int = 0):
    """Recursively collect ``{href, title}`` entries from a JSON list
    payload — covers the reference's list-API responses where the
    announcement list sits under varying paths
    (``data.catalogs[0].articles``, ``props.pageProps...``, etc.)."""
    out = []
    if depth > 6:
        return out
    if isinstance(obj, dict):
        if "href" in obj and isinstance(obj["href"], str):
            out.append((obj["href"], str(obj.get("title", "")).strip()))
        else:
            for v in obj.values():
                out.extend(_links_from_json(v, depth + 1))
    elif isinstance(obj, list):
        for v in obj:
            out.extend(_links_from_json(v, depth + 1))
    return out


def links_from_page(html: str):
    """Frontier-discovery entry point: anchors first (HTML hubs), then
    ``__NEXT_DATA__`` JSON, then ``<pre>``-JSON API payloads."""
    if "<a " in html or "<a\t" in html or "<a\n" in html:
        links = extract_links(html)
        if links:
            return links
    if "__NEXT_DATA__" in html:
        data = get_next_data(html)
        if data is not None:
            links = _links_from_json(data)
            if links:
                return links
    if "<pre" in html:
        data = get_json_from_pre(html)
        if isinstance(data, (dict, list)):
            return _links_from_json(data)
    return []


def get_json_from_pre(html: str):
    """``<pre>``-wrapped JSON API response (reference
    ``exchange/base_scraper.py:287-299``): parse the first <pre>'s content
    as JSON; return the raw html on failure (reference behaviour)."""
    content = find_tag_content(html, "pre")
    if content is None:
        return html
    try:
        return json.loads(content.strip())
    except json.JSONDecodeError:
        return html


def article_detail_from_next_data(data):
    """JSON-detail-page projection (M6 full surface): the reference's
    bybit detail extraction walks
    ``props.pageProps.articleDetail.content.json.children[*]``, keeps
    ``type == 'p'`` nodes, and concatenates their text children
    (reference ``exchange/bybit.py:81-102``; gate/mexc variants
    ``exchange/gate.py:59-66``, ``exchange/mexc.py:83-98``).

    Returns ``(title, [paragraph, ...])`` or None when the blob is not
    an article-detail payload (e.g. a hub page's ``__NEXT_DATA__``)."""
    if not isinstance(data, dict):
        return None
    detail = (
        data.get("props", {}).get("pageProps", {}).get("articleDetail")
    )
    if not isinstance(detail, dict):
        return None
    title = str(detail.get("title", ""))
    children = (
        detail.get("content", {}).get("json", {}).get("children", [])
    )
    paras = []
    for node in children:
        if not isinstance(node, dict) or node.get("type") != "p":
            continue  # the reference skips imgs/embeds (bybit.py:92)
        parts = [
            str(c.get("text", ""))
            for c in node.get("children", [])
            if isinstance(c, dict)
        ]
        paras.append("".join(parts))
    return title, paras


def get_next_data(html: str, script_id: str = "__NEXT_DATA__"):
    """``<script id="__NEXT_DATA__" type="application/json">`` JSON blob
    (reference ``exchange/bybit.py:54-78`` and near-copies).  None when
    absent or unparseable."""
    content = find_tag_content(html, "script", id=script_id)
    if content is None:
        return None
    try:
        return json.loads(content)
    except json.JSONDecodeError:
        return None


_BASE_HREF_RE = re.compile(
    r"<base\s[^>]*?href\s*=\s*([\"'])(.*?)\1", re.IGNORECASE | re.DOTALL
)
_CANONICAL_LINK_RE = re.compile(
    r"<link\s[^>]*?rel\s*=\s*([\"'])canonical\1[^>]*?"
    r"href\s*=\s*([\"'])(.*?)\2",
    re.IGNORECASE | re.DOTALL,
)
_CANONICAL_LINK_RE2 = re.compile(
    r"<link\s[^>]*?href\s*=\s*([\"'])(.*?)\1[^>]*?"
    r"rel\s*=\s*([\"'])canonical\3",
    re.IGNORECASE | re.DOTALL,
)


def base_href(html: str) -> str | None:
    """The document's ``<base href>`` (first wins, per HTML spec), or
    None.  Relative-link resolution must use it as the join base when
    present — browsers do, so a crawler that doesn't computes
    different urls than users see."""
    m = _BASE_HREF_RE.search(html)
    return m.group(2).strip() or None if m else None


def canonical_link(html: str) -> str | None:
    """The page's ``<link rel="canonical" href=...>`` target, or None.
    Attribute order is free in HTML, so both orders are matched.  A
    dedup-aware crawler keys its seen-set / dedup on the canonical
    target when a page declares one."""
    m = _CANONICAL_LINK_RE.search(html)
    if m:
        return m.group(3).strip() or None
    m = _CANONICAL_LINK_RE2.search(html)
    return m.group(2).strip() or None if m else None
