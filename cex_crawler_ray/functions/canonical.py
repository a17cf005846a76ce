"""URL canonicalization + hashing (vectorized helpers).

The reference canonicalizes ad-hoc: relative->absolute joins and
trailing-slash strips scattered per site (reference
``exchange/bingx.py:36,57-58,66-70``, ``exchange/lbank.py:53``,
``exchange/weex.py:57``), and derives ids as the site id or ``md5(url)``
(reference ``exchange/weex.py:145``, ``exchange/bybit.py:121``).

Here canonicalization is one explicit rule set so the URL-seen filter
(state/seen_filter.py) keys on a stable 64-bit hash:

1. join relative hrefs against the page's base url,
2. lowercase scheme + host, strip a default port,
3. drop the fragment,
4. strip a single trailing slash on non-root paths.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str, base: str | None = None) -> str:
    if base:
        url = urljoin(base, url)
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    host, _, port = netloc.partition(":")
    if port and port == _DEFAULT_PORTS.get(scheme):
        netloc = host
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        # strip ALL trailing slashes (idempotence: '///' must not take
        # three passes to normalize — caught by hypothesis)
        path = path.rstrip("/") or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    return urlsplit(url).netloc.lower().partition(":")[0]


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of a canonical url (blake2b, seedless)."""
    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big"
    )


def md5_id(url: str) -> str:
    """Reference id-derivation fallback: ``md5(url)`` hexdigest
    (reference ``exchange/weex.py:145``)."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()


def host_bucket(host: str, num_buckets: int) -> int:
    """Deterministic host partition (skew-spreading key for the page
    store and the politeness/frontier shuffles)."""
    h = int.from_bytes(
        hashlib.blake2b(host.encode("utf-8"), digest_size=8).digest(), "big"
    )
    return h % num_buckets
