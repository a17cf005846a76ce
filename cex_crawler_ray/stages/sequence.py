r"""User-sequence analytics: ordered funnels and retention cohorts.

The reference engine has no user analytics at all — its closest analog
is the per-exchange announcement timeline it assembles for the report
(reference ``collect_data.py`` report ordering).  A crawl/clickstream
corpus at scale needs both classic sequence reductions:

``funnel_counts`` — how many users completed step 1, step 1→2 (strictly
after), step 1→2→3, … for an ordered list of event types.  One hash
shuffle on the user key; inside a partition each step is a vectorized
pandas pass (``groupby.min`` + a mapped lower bound), NO per-user loop.
Only one tiny (step, count) row per (partition, step) leaves the
partition, so the final aggregate is trivially small.

``retention_cohorts`` — users grouped by their first-activity day
(cohort), counted per (cohort_day, day_offset) of later activity.  A
user belongs to exactly one cohort, so per-partition local dedup of
(user, active-day) rows is exact; the shuffle carries one row per
(user, active day), never raw events.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .dedup import _coarse_group_apply


def funnel_counts(
    events: "ray.data.Dataset",
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Strict-order funnel: a user completes step k when an event of
    type ``steps[k]`` exists STRICTLY AFTER their step k-1 completion
    time (first-completion semantics).  Returns one row per step:
    ``(step_idx, step, n_users)``.
    """
    import pandas as pd

    def partial(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        counts = np.zeros(len(steps), dtype=np.int64)
        if len(df):
            # per-user completion time of the previous step; NaT = not
            # yet in the funnel (step 0 has no lower bound)
            bound = None
            for k, step in enumerate(steps):
                sub = df[df[type_col] == step]
                if bound is not None:
                    lb = sub[user_col].map(bound)
                    sub = sub[lb.notna() & (sub[ts_col] > lb)]
                done = sub.groupby(user_col, sort=False)[ts_col].min()
                counts[k] = len(done)
                if len(done) == 0:
                    break
                bound = done
        return pa.table(
            {
                "step_idx": pa.array(np.arange(len(steps)), pa.int64()),
                "step": pa.array(list(steps), pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    per_part = _coarse_group_apply(events, user_col, partial, num_parts)
    # tiny final reduce: len(steps) rows per partition
    agg = per_part.groupby(["step_idx", "step"]).sum("n")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "step_idx": batch["step_idx"].cast(pa.int64()),
                "step": batch["step"],
                "n_users": batch["sum(n)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def retention_cohorts(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Cohort retention: users bucketed by first-activity day; output
    one row per ``(cohort_day, day_offset)`` with the distinct-user
    count.  ``cohort_day`` is a '%Y-%m-%d' string, offsets in days.
    """
    import pandas as pd

    def partial(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        if len(df) == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "cohort_day": pa.array([], pa.string()),
                    "day_offset": pa.array([], pa.int64()),
                }
            )
        day = df[ts_col].dt.floor("D")
        d0 = day.groupby(df[user_col]).transform("min")
        out = pd.DataFrame(
            {
                user_col: df[user_col],
                "cohort_day": d0.dt.strftime("%Y-%m-%d"),
                "day_offset": ((day - d0).dt.days).astype("int64"),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    per_user = _coarse_group_apply(events, user_col, partial, num_parts)
    agg = per_user.groupby(["cohort_day", "day_offset"]).count()

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": batch["cohort_day"],
                "day_offset": batch["day_offset"].cast(pa.int64()),
                "n_users": batch["count()"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def sequence_pattern(
    events: "ray.data.Dataset",
    pattern: str,
    type_map: dict[str, str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """MATCH_RECOGNIZE-lite: encode each user's time-ordered event-type
    sequence as a character string (``type_map``: event type -> one
    char) and keep users whose sequence matches ``pattern`` (an
    uncompiled regex, compiled once per task).

    One hash shuffle on the user key; inside a partition the encode is
    a vectorized ``map`` + ``groupby.agg(''.join)`` and the match is
    pandas' C-looped ``str.contains``.  Output is one (user_id,
    seq_len) row per matching user — bounded by the user count, never
    the event count.
    """
    import re as _re

    import pandas as pd

    rx = _re.compile(pattern)

    def match_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        if len(df) == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "seq_len": pa.array([], pa.int64()),
                }
            )
        df = df.sort_values([user_col, ts_col, id_col], kind="mergesort")
        ch = df[type_col].map(type_map).fillna("?")
        seq = ch.groupby(df[user_col]).agg("".join)
        hit = seq[seq.str.contains(rx)]
        return pa.table(
            {
                user_col: pa.array(
                    hit.index.to_numpy(dtype=np.int64), pa.int64()
                ),
                "seq_len": pa.array(
                    hit.str.len().to_numpy(dtype=np.int64), pa.int64()
                ),
            }
        )

    return _coarse_group_apply(events, user_col, match_part, num_parts)


def frequent_triples(
    lineitem: "ray.data.Dataset",
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """A-priori frequent triple mining (Agrawal & Srikant 1994): item
    triples (a < b < c) co-occurring in >= ``min_support`` orders.

    The classic two-round MapReduce frequent-itemset plan:

    1. L2 pass — pair supports via the ``copurchase_pairs`` combiner;
       pairs with support >= min_support become the broadcast
       candidate set (packed a<<32|b keys, ``ray.put`` once).
    2. Triple pass — baskets co-partition by order key; inside each
       partition the pair frame is FIRST pruned to frequent pairs
       (the a-priori bound: every sub-pair of a frequent triple is
       frequent, so pruning is LOSSLESS and the SQL oracle is the
       plain triple count), then extended by a third item and pruned
       again on (a, c) and (b, c).  Local pre-count bounds the
       exchange by distinct surviving triples, not baskets.

    Without the prune the triple expansion is O(basket^3) on every
    basket; with it only baskets containing at least one frequent
    pair expand at all — at 100 TB that is the difference between a
    feasible second round and a combinatorial explosion.
    """
    import pandas as pd

    pair_tbl = copurchase_pairs(
        lineitem, order_col, item_col, min_support, num_parts
    )

    def pack(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
        return (a.astype(np.uint64) << np.uint64(32)) | b.astype(
            np.uint64
        )

    pt = pair_tbl.to_pandas()  # frequent pairs only: candidate-bounded
    if "item_a" not in pt.columns:  # empty result drops its schema
        pt = pd.DataFrame({"item_a": [], "item_b": []})
    freq = np.sort(
        pack(
            pt["item_a"].to_numpy(np.int64),
            pt["item_b"].to_numpy(np.int64),
        )
    )
    if freq.size == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "item_a": pa.array([], pa.int64()),
                    "item_b": pa.array([], pa.int64()),
                    "item_c": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        )
    freq_ref = ray.put(freq)

    def triple_part(group: pa.Table) -> pa.Table:
        fr = ray.get(freq_ref)
        df = group.to_pandas().drop_duplicates([order_col, item_col])
        m = df.merge(df, on=order_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        ka = m[f"{item_col}_a"].to_numpy(np.int64)
        kb = m[f"{item_col}_b"].to_numpy(np.int64)
        m = m[np.isin(pack(ka, kb), fr)]  # a-priori prune on (a, b)
        t = m.merge(
            df.rename(columns={item_col: f"{item_col}_c"}), on=order_col
        )
        t = t[t[f"{item_col}_b"] < t[f"{item_col}_c"]]
        a = t[f"{item_col}_a"].to_numpy(np.int64)
        b = t[f"{item_col}_b"].to_numpy(np.int64)
        c = t[f"{item_col}_c"].to_numpy(np.int64)
        keep = np.isin(pack(a, c), fr) & np.isin(pack(b, c), fr)
        t = t[keep]
        loc = (
            t.groupby(
                [f"{item_col}_a", f"{item_col}_b", f"{item_col}_c"],
                sort=False,
            )
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "item_a": pa.array(loc[f"{item_col}_a"], pa.int64()),
                "item_b": pa.array(loc[f"{item_col}_b"], pa.int64()),
                "item_c": pa.array(loc[f"{item_col}_c"], pa.int64()),
                "n": pa.array(loc["n"], pa.int64()),
            }
        )

    partials = _coarse_group_apply(
        lineitem, order_col, triple_part, num_parts
    )
    agg = partials.groupby(["item_a", "item_b", "item_c"]).sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch["sum(n)"].cast(pa.int64())
        t = pa.table(
            {
                "item_a": batch["item_a"].cast(pa.int64()),
                "item_b": batch["item_b"].cast(pa.int64()),
                "item_c": batch["item_c"].cast(pa.int64()),
                "n_orders": n,
            }
        )
        return t.filter(pc.greater_equal(n, pa.scalar(min_support)))

    return agg.map_batches(finish, batch_format="pyarrow")


def copurchase_pairs(
    lineitem: "ray.data.Dataset",
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Market-basket pair counts: for every unordered pair of distinct
    items appearing in the same order, count the co-occurring orders;
    keep pairs with support >= ``min_support``.

    Two-level combiner: partition by order key (a basket lands whole in
    one partition), expand each basket's pairs with a vectorized
    self-merge, pre-count LOCALLY, then one tiny (a, b, partial-n)
    shuffle to the final sum.  Pair expansion is quadratic in basket
    size but baskets are small (TPC-H <= 7 items); the local pre-count
    is what keeps the exchange bounded by distinct pairs, not baskets.
    """
    import pandas as pd

    def pair_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().drop_duplicates([order_col, item_col])
        m = df.merge(df, on=order_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        loc = (
            m.groupby([f"{item_col}_a", f"{item_col}_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "item_a": pa.array(loc[f"{item_col}_a"], pa.int64()),
                "item_b": pa.array(loc[f"{item_col}_b"], pa.int64()),
                "n": pa.array(loc["n"], pa.int64()),
            }
        )

    partials = _coarse_group_apply(lineitem, order_col, pair_part, num_parts)
    agg = partials.groupby(["item_a", "item_b"]).sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch["sum(n)"].cast(pa.int64())
        t = pa.table(
            {
                "item_a": batch["item_a"].cast(pa.int64()),
                "item_b": batch["item_b"].cast(pa.int64()),
                "n_orders": n,
            }
        )
        return t.filter(pc.greater_equal(n, pa.scalar(min_support)))

    return agg.map_batches(finish, batch_format="pyarrow")
