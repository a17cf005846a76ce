"""M16: request header / fingerprint synthesis (pure functions).

The reference fabricates per-request client identity for the hub APIs —
uuid device ids, a csrf token, a base64 device-info blob and a browser
user-agent (reference ``exchange/binance.py:28-73``).  Here the same
surface is pure and DETERMINISTIC: every value is derived from
(url, seed) via blake2b, so a crawl's request stream is reproducible
(north_rule: reproducible crawl under fixed inputs) and unit-testable.
The functions are transport hooks: the live fetch stage
(``sources/live_fetch.py``) calls ``synth_headers`` per request.
"""

from __future__ import annotations

import base64
import hashlib
import json

_UA_POOL = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/121.0.0.0 Safari/537.36",
)

_SCREEN_POOL = ((1920, 1080), (2560, 1440), (1440, 900), (1366, 768))


def _digest(*parts: str, size: int = 16) -> bytes:
    h = hashlib.blake2b(digest_size=size)
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.digest()


def device_uuid(url: str, seed: int = 0) -> str:
    """RFC-4122-shaped uuid, deterministic in (url, seed) — the
    reference's ``uuid.uuid4()`` device ids (binance.py:34) made
    reproducible."""
    b = bytearray(_digest("uuid", url, str(seed)))
    b[6] = (b[6] & 0x0F) | 0x40  # version 4
    b[8] = (b[8] & 0x3F) | 0x80  # variant
    h = bytes(b).hex()
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def csrf_token(url: str, seed: int = 0) -> str:
    """Hex csrf token (the reference derives one per session,
    binance.py:55)."""
    return _digest("csrf", url, str(seed)).hex()


def device_info_b64(url: str, seed: int = 0) -> str:
    """Base64 device-info blob: canonical-JSON of deterministic
    screen/platform fields (the reference builds the analogous plaintext
    dict and base64s it, binance.py:36-53)."""
    d = _digest("devinfo", url, str(seed))
    w, h = _SCREEN_POOL[d[0] % len(_SCREEN_POOL)]
    info = {
        "screen_resolution": f"{w},{h}",
        "available_screen_resolution": f"{w},{h - 40}",
        "system_version": "Linux x86_64",
        "brand_model": "unknown",
        "system_lang": "en-US",
        "timezone": "GMT+08:00",
        "timezoneOffset": -480,
        "canvas_code": _digest("canvas", url, str(seed), size=4).hex(),
        "webgl_vendor": "Google Inc.",
        "audio": _digest("audio", url, str(seed), size=4).hex()[:10],
        "platform": "Linux x86_64",
    }
    return base64.b64encode(
        json.dumps(info, sort_keys=True, separators=(",", ":")).encode()
    ).decode()


def user_agent(url: str, seed: int = 0) -> str:
    d = _digest("ua", url, str(seed))
    return _UA_POOL[d[0] % len(_UA_POOL)]


def synth_headers(url: str, seed: int = 0) -> dict:
    """The full per-request header set the reference sends to hub APIs
    (binance.py:56-73), deterministic in (url, seed)."""
    return {
        "user-agent": user_agent(url, seed),
        "csrftoken": csrf_token(url, seed),
        "device-info": device_info_b64(url, seed),
        "x-trace-id": device_uuid(url, seed),
        "x-ui-request-trace": device_uuid(url, seed),
        "content-type": "application/json",
        "lang": "en",
    }
