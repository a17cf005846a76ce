r"""Recrawl scheduling: per-page change-rate estimation + staleness
priority from an observation log.

The reference engine recrawls every source on every cron tick
(reference ``main.py`` loop — no scheduling at all); a 10^10-url
deployment cannot.  The classic answer (Cho & Garcia-Molina 2003,
"Effective Page Refresh Policies for Web Crawlers") estimates each
page's change rate from its observation history and spends the crawl
budget on the stalest fast-changing pages.

``change_rate_priorities`` reduces an observation log (page key,
observation timestamp, changed-this-visit flag) to one row per page::

    n_obs      observations of the page
    n_changes  observations where the page had changed
    age_s      seconds since the page's last observation, against the
               log's global max timestamp ("now")
    priority   age_s * n_changes // n_obs — integer-exact expected
               staleness (the Poisson-rate numerator of Cho-GM's
               lambda-hat estimator; integer division keeps the Ray
               and SQL twins bit-identical with no float rounding)

Scale shape: one per-batch combiner collapses the log to per-key
partial rows (key, n_obs, n_changes, last_us) — the only shuffle is
the keyed groupby of those partials, never raw observations; "now" is
a driver scalar off the aggregate (one int).  No driver-side rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def change_rate_priorities(
    obs: "ray.data.Dataset",
    key_col: str = "page_key",
    ts_col: str = "ts",
    changed_col: str = "changed",
) -> "ray.data.Dataset":
    """Observation log -> (key, n_obs, n_changes, age_s, priority)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        us = (
            batch[ts_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ch = (
            batch[changed_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        u, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        c = np.zeros(len(u), dtype=np.int64)
        np.add.at(c, inv, ch)
        last = np.zeros(len(u), dtype=np.int64)
        np.maximum.at(last, inv, us)
        return pa.table(
            {
                key_col: pa.array(u, pa.int64()),
                "n_obs": pa.array(n, pa.int64()),
                "n_changes": pa.array(c, pa.int64()),
                "last_us": pa.array(last, pa.int64()),
            }
        )

    agg = (
        obs.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            ray.data.aggregate.Sum("n_obs"),
            ray.data.aggregate.Sum("n_changes"),
            ray.data.aggregate.Max("last_us"),
        )
    ).materialize()
    # "now" = global max observation time — one int off the (small,
    # per-key) aggregate, not a pass over the raw log
    now_us = agg.max("max(last_us)")

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["sum(n_obs)"].to_numpy(zero_copy_only=False)
        c = batch["sum(n_changes)"].to_numpy(zero_copy_only=False)
        last = batch["max(last_us)"].to_numpy(zero_copy_only=False)
        age_s = (now_us - last) // 1_000_000
        prio = (age_s * c) // n
        return pa.table(
            {
                key_col: batch[key_col],
                "n_obs": pa.array(n, pa.int64()),
                "n_changes": pa.array(c, pa.int64()),
                "age_s": pa.array(age_s, pa.int64()),
                "priority": pa.array(prio, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
