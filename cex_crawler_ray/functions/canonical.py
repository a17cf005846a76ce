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


# 64-bit url hash: Horner polynomial over utf-8 bytes (FNV prime),
# finalized with the splitmix64 mixer xor'd with the length.  Chosen
# over blake2b (rounds 1-3) because it is the SAME function scalar and
# vectorized — ``url_hash64_arrow`` hashes a whole Arrow string column
# with numpy column ops, lifting the frontier-admission kernel ceiling
# (the per-url hashlib loop was the profile's top cost).  Hash values
# are derived at runtime everywhere (seen filter, page-store buckets,
# schedule tie-breaks); nothing persists them across versions.
_HASH_P = 0x100000001B3
_MASK64 = (1 << 64) - 1


def _mix64_int(x: int) -> int:
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _MASK64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _MASK64
    x ^= x >> 31
    return x


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of a canonical url (mixed polynomial,
    seedless; identical to ``url_hash64_arrow`` per element)."""
    b = url.encode("utf-8")
    h = 0
    for byte in b:
        h = (h * _HASH_P + byte) & _MASK64
    return _mix64_int(h ^ len(b))


def url_hash64_arrow(arr) -> "np.ndarray":
    """Vectorized ``url_hash64`` over a pyarrow string column.

    Bytes are scattered into a right-aligned (N, max_len) uint8 matrix
    (leading zero pads are identities under Horner), then hashed with
    one column-wise Horner pass in uint64 — no per-url Python work.
    Nulls hash like empty strings."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    off_dtype = (
        np.int64 if pa.types.is_large_string(arr.type) else np.int32
    )
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=off_dtype, count=n + 1, offset=arr.offset * np.dtype(off_dtype).itemsize
    ).astype(np.int64)
    if bufs[2] is None:  # all-empty / all-null column has no data buffer
        data = np.zeros(0, dtype=np.uint8)
    else:
        data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts, ends = offsets[:-1], offsets[1:]
    lens = ends - starts
    P = np.uint64(_HASH_P)
    h = np.zeros(n, dtype=np.uint64)
    # group rows by EXACT length: each group's bytes gather as one
    # (k, L) 2D fancy-index (urls cluster into few distinct lengths,
    # so the loop runs a handful of fully vectorized passes; a long
    # outlier only pays for itself)
    order = np.argsort(lens, kind="stable")
    slens = lens[order]
    bounds = np.flatnonzero(np.diff(slens)) + 1
    for grp in np.split(order, bounds):
        L = int(lens[grp[0]])
        if L == 0:
            continue
        mat = data[starts[grp][:, None] + np.arange(L, dtype=np.int64)]
        hb = np.zeros(len(grp), dtype=np.uint64)
        for c in range(L):
            hb = hb * P + mat[:, c]
        h[grp] = hb
    h ^= lens.astype(np.uint64)
    # splitmix64 finalizer (vector form of _mix64_int)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


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
