"""Fixed Arrow schemas for every logical table.

The reference's records are implicit Python dicts (SURVEY.md §1.1); here
every dataset flowing through Ray Data has a pinned ``pyarrow.Schema`` so
blocks stay zero-copy Arrow end to end.

``PAGES`` is the authoritative input shape from BASELINE.json
``input_hint``: Common-Crawl-style Parquet
``(url, warc_ts, html, text, lang)``.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("title", pa.string()),  # anchor text from discovery; '' for seeds
        ("priority", pa.int32()),
        ("depth", pa.int32()),
        ("discovered_ts", pa.int64()),  # logical clock: the discovery round
    ]
)

# persisted fetched rows (html is projected away before any round
# boundary — it exists only transiently inside the fused round pipeline)
FETCHED = pa.schema(
    [
        *FRONTIER,
        ("fetch_slot", pa.int32()),  # deterministic order within (round, host)
        ("status", pa.int32()),  # 200 ok | 404 miss
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("fetch_round", pa.int32()),
    ]
)

EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("exchange", pa.string()),
        ("article_id", pa.string()),
        ("title", pa.string()),
        ("release_time", pa.string()),  # HK-local '%Y-%m-%d %H:%M:%S'
        ("text", pa.string()),
        ("status", pa.string()),  # 'ok' | 'tombstone' (recency-skipped, M8/K3)
    ]
)

RECORDS = pa.schema(
    [
        ("symbol", pa.string()),
        ("action", pa.string()),
        ("type", pa.string()),
        ("time", pa.string()),
        ("exchange", pa.string()),
        ("title", pa.string()),
        ("url", pa.string()),
        ("release_time", pa.string()),
        ("content", pa.string()),
    ]
)
