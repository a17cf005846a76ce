"""Flagship pipeline: synthetic web -> crawl -> extract -> analyze ->
records -> report.  The end-to-end equivalent of the reference's
``python main.py`` run (``main.py:148-194``), with deterministic
conformance constants so every output is reproducible and
SQL-recomputable by the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import os

import ray

from ..sources.page_store import PageStore
from ..sources.pages import (
    pages_from_documents,
    seeds_for_sources,
    sources_in,
    src_num,
)
from ..stages.analyze import records_from_extracted
from ..stages.extract import profiles_for_sources
from ..pipelines.crawl import CrawlConfig, CrawlRun, run_crawl

# Conformance constants (replace the reference's now()/random delays)
AS_OF_HK = "2024-03-08 09:00:00"  # 'now' for the recency window (M8)
AS_OF_DATE = "2024-03-08"  # 'today' for the report layer (main.py:54)
OFFSET_DAYS = 7
DEFAULT_DELAY_MS = 500  # politeness: 20 fetch tokens / host / round
MAX_ROUNDS = 60

_STORE_ROOT = "/tmp/cex_crawler_ray_stores"


def page_store_for(
    sf_dir: str,
    replicate: int = 1,
    num_buckets: int | None = None,
    pad: int = 1,
    include_sitemaps: bool = False,
) -> PageStore:
    """Build (once, cached on disk) the bucketed page store for a
    testdata dir.  Generation is deterministic, so reuse is safe.

    Bucket count defaults to ~4x the cores for bench-scale stores
    (fetch parallelism = buckets, see PageStore.fetch_aligned) and 16
    for the small conformance webs."""
    if num_buckets is None:
        num_buckets = 128 if replicate >= 10 else 16
    # bump the version suffix whenever synthetic page generation changes;
    # the source-file fingerprint invalidates the cache if the testdata
    # itself is ever regenerated
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    # hash_fp ties the cache to the CURRENT url_hash64: the on-disk
    # bucket column is `url_hash64(url) % num_buckets`, so a store built
    # under a different hash function would silently 404 every fetch
    from ..functions.canonical import url_hash64

    hash_fp = url_hash64("store-bucket-probe")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{replicate}:{num_buckets}:{pad}"
        f":{st.st_size}:{int(st.st_mtime)}:v5:h{hash_fp}"
        f"{':sm' if include_sitemaps else ''}".encode()
    ).hexdigest()[:12]
    path = os.path.join(_STORE_ROOT, key)
    marker = os.path.join(path, "_SUCCESS")
    store = PageStore(path, num_buckets=num_buckets)
    if not os.path.exists(marker):
        store.write(
            pages_from_documents(
                sf_dir,
                replicate=replicate,
                pad=pad,
                include_sitemaps=include_sitemaps,
            )
        )
        with open(marker, "w") as f:
            f.write("ok")
    return store


def title_filters_for(sources) -> dict:
    """M12 frontier title filters in the flagship (reference
    ``exchange/lbank.py:179-184`` keeps only 'Delist' titles): hosts
    with source index % 7 == 6 admit only English-titled articles —
    anchor titles are 'Doc {id} {lang}', so the keep-substring ' en'
    selects lang == 'en' (SQL: ``NOT (src % 7 = 6 AND lang <> 'en')``)."""
    from ..sources.pages import host_for

    return {
        host_for(s): (" en",) for s in sources if src_num(s) % 7 == 6
    }


def crawl_config_for(sf_dir: str, **overrides) -> CrawlConfig:
    sources = sources_in(sf_dir)
    kwargs = dict(
        max_rounds=MAX_ROUNDS,
        seen_shards=4,
        profiles=profiles_for_sources(sources),
        as_of_hk=AS_OF_HK,
        offset_days=OFFSET_DAYS,
        title_filters=title_filters_for(sources),
    )
    kwargs.update(overrides)
    return CrawlConfig(**kwargs)


def crawl_delays_for(sources) -> dict:
    """Per-host crawl delays (deterministic): source index % 3 scales
    the delay, so hosts get 20 / 10 / 6 fetch tokens per round — the
    per-host token-bucket is exercised in the conformance path, not
    just in tests.  The same rule is PUBLISHED in each host's
    /robots.txt (sources/pages.py robots_txt_for), which is what the
    flagship actually parses."""
    from ..sources.pages import crawl_delay_ms_for, host_for

    return {
        host_for(s): crawl_delay_ms_for(s, DEFAULT_DELAY_MS)
        for s in sources
    }


def run_flagship_crawl(
    sf_dir: str,
    replicate: int = 1,
    checkpoint_dir: str | None = None,
    **cfg_overrides,
) -> CrawlRun:
    """The flagship crawl BOOTSTRAPS its politeness policy by fetching
    and parsing each host's /robots.txt from the (simulated) web —
    north_star's robots.txt caching; the synthetic robots bodies render
    exactly the rules the DuckDB oracle assumes, so conformance is
    end-to-end through the parser."""
    from ..pipelines.crawl import bootstrap_robots
    from ..sources.pages import host_for

    sources = sources_in(sf_dir)
    store = page_store_for(sf_dir, replicate=replicate)
    robots = bootstrap_robots(
        store,
        [host_for(s) for s in sources],
        default_delay_ms=DEFAULT_DELAY_MS,
    )
    return run_crawl(
        store,
        seeds_for_sources(sources),
        robots,
        crawl_config_for(sf_dir, **cfg_overrides),
        checkpoint_dir=checkpoint_dir,
    )


def article_rows(extracted_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Detail pages only — the reference analyzes announcement detail
    pages, never hub/list pages.  Vectorized substring filter."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def keep_articles(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.match_substring(batch["url"].combine_chunks(), "/articles/")
        )

    return extracted_ds.map_batches(keep_articles, batch_format="pyarrow")


def records_for(sf_dir: str, run: CrawlRun | None = None) -> "ray.data.Dataset":
    if run is None:
        run = run_flagship_crawl(sf_dir)
    return records_from_extracted(article_rows(run.extracted_dataset()))


def spot_cex_for(sf_dir: str) -> list:
    """Report market membership (deterministic analog of the reference's
    hand-maintained SPOT_CEX list, ``main.py:39``): even source index."""
    return [s for s in sources_in(sf_dir) if src_num(s) % 2 == 0]


def futures_cex_for(sf_dir: str) -> list:
    """FUTURES_CEX analog (``main.py:40``): source index % 3 != 1."""
    return [s for s in sources_in(sf_dir) if src_num(s) % 3 != 1]
