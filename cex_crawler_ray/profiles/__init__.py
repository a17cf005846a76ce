"""Host-profile data packs.

``real_exchanges`` encodes the reference crawler's actual per-site
knowledge — discovery endpoints, detail transports, id/timestamp/url
rules, extraction variants — as *data* consumed by the generic engine
stages (SURVEY.md §2.7's "profiles are data, stages are the only
code" design).
"""

from .real_exchanges import (  # noqa: F401
    REAL_EXCHANGES,
    RealExchangeProfile,
    article_id,
    detail_text,
    normalize_release_time,
    real_extract_profiles,
    record_url,
    tombstone_exchange,
)
