"""Mirror-host detection — host pairs serving (near-)identical content.

The web is full of mirrors: CDN vanity hosts, www/apex duplicates,
country-code clones, wholesale site rips.  A crawler that doesn't
detect them fetches every page twice and a training-data pipeline
double-counts the corpus.  The classic formulation (Bharat & Broder,
"Mirror, mirror on the Web", WWW 1999) scores host pairs by the
OVERLAP of their content fingerprints; pairs whose shared-digest count
clears a fraction of the smaller host's inventory are mirrors
(overlap coefficient — containment-style, so a small full mirror of a
big site still scores 1.0, where Jaccard would dilute it).

Shape, Ray-Data-first:

1. ``(host, text)`` rows collapse to ``(host, digest64)`` in the
   ingest map — 8-byte blake2b like the exact-dedup family; the 64-bit
   digest IS the content identity for the shuffle (same keyspace
   assumption as ``stages/dedup.py``; the SQL twin joins on raw text,
   the same equality relation).  Page text never enters a shuffle.
2. ONE digest-keyed coarse partition dedups ``(host, digest)`` and
   emits, per partition: per-host distinct-count partials AND
   host-pair co-occurrence partials (pairs expanded per digest with a
   by-size vectorized upper-triangle kernel — no per-row Python).
   Digests shared by more than ``max_hosts_per_digest`` hosts are
   dropped as boilerplate (a chrome footer on 10^5 hosts is not mirror
   signal, and k hosts would cost k^2 pairs); the cap is a documented
   semantic knob, OFF below it — test corpora never hit it.
3. Pair partials sum in a pair-keyed coarse partition; per-host counts
   sum in a host-keyed one; two co-partition hash joins attach
   ``n_a``/``n_b`` to each surviving pair (pairs are bounded by
   CO-OCCURRING hosts, a tiny fraction of the host table, so the join
   left side is small by construction).
4. The mirror predicate is exact integer arithmetic:
   ``den * shared >= num * min(n_a, n_b)`` — no float threshold to
   drift from the SQL twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.canonical import url_hash64_arrow
from .dedup import _coarse_group_apply, _hash64

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _pairs_by_size(hosts: np.ndarray, starts: np.ndarray, sizes: np.ndarray):
    """Upper-triangle pair expansion for variable-size digest groups,
    vectorized PER DISTINCT SIZE: all groups of size s are stacked into
    a (g, s) matrix and indexed with one precomputed triu index pair."""
    out_a, out_b = [], []
    for s in np.unique(sizes):
        if s < 2:
            continue
        g_starts = starts[sizes == s]
        # (g, s) matrix of host labels, groups stacked row-wise
        idx = g_starts[:, None] + np.arange(s)[None, :]
        mat = hosts[idx]
        iu0, iu1 = np.triu_indices(int(s), k=1)
        out_a.append(mat[:, iu0].ravel())
        out_b.append(mat[:, iu1].ravel())
    if not out_a:
        e = np.array([], dtype=object)
        return e, e
    return np.concatenate(out_a), np.concatenate(out_b)


def mirror_host_pairs(
    host_text: "ray.data.Dataset",
    num: int = 1,
    den: int = 2,
    num_parts: int = 64,
    max_hosts_per_digest: int = 64,
) -> "ray.data.Dataset":
    """Host pairs with digest-overlap coefficient >= num/den.

    ``host_text``: Dataset of (host: string, text: string) — one row
    per (host, page).  Returns (host_a, host_b, shared, n_a, n_b)
    with host_a < host_b, sorted semantics left to the caller."""
    from .join import hash_join

    def digest(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        h = np.fromiter(
            (np.uint64(_hash64(t)) for t in texts),
            dtype=np.uint64,
            count=len(texts),
        ).astype(np.int64)
        return pa.table(
            {
                "host": batch["host"].cast(pa.string()),
                "h64": pa.array(h, pa.int64()),
            }
        )

    hd = host_text.map_batches(digest, batch_format="pyarrow")

    def per_part(tbl: pa.Table) -> pa.Table:
        df = tbl.select(["host", "h64"]).to_pandas()
        df = df.drop_duplicates(["host", "h64"])
        # per-host distinct-count partials (kind 'c')
        cnt = df.groupby("host").size().reset_index(name="n")
        # pair partials (kind 'p'): sort by digest then host so each
        # digest group is contiguous and lexicographically ordered
        df = df.sort_values(["h64", "host"], kind="mergesort")
        hs = df["host"].to_numpy(object)
        keys = df["h64"].to_numpy(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        sizes = np.diff(np.append(starts, len(keys)))
        keep = sizes <= max_hosts_per_digest
        a, b = _pairs_by_size(hs, starts[keep], sizes[keep])
        if len(a):
            pairs = (
                pd.DataFrame({"a": a, "b": b})
                .groupby(["a", "b"])
                .size()
                .reset_index(name="n")
            )
            pa_a = pairs["a"].to_numpy(object)
            pa_b = pairs["b"].to_numpy(object)
            pa_n = pairs["n"].to_numpy(np.int64)
        else:
            pa_a = np.array([], dtype=object)
            pa_b = np.array([], dtype=object)
            pa_n = np.array([], dtype=np.int64)
        return pa.table(
            {
                "a": pa.array(
                    np.concatenate(
                        [cnt["host"].to_numpy(object), pa_a]
                    ),
                    pa.string(),
                ),
                "b": pa.array(
                    np.concatenate(
                        [np.full(len(cnt), "", dtype=object), pa_b]
                    ),
                    pa.string(),
                ),
                "n": pa.array(
                    np.concatenate(
                        [cnt["n"].to_numpy(np.int64), pa_n]
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "kind": pa.array(
                    ["c"] * len(cnt) + ["p"] * len(pa_n), pa.string()
                ),
            }
        )

    both = _coarse_group_apply(hd, "h64", per_part, num_parts=num_parts)
    both = both.materialize()  # two consumers below (repo convention)

    def keyed(kind: str):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            sub = batch.filter(
                pc.equal(batch["kind"].combine_chunks(), kind)
            )
            ka = url_hash64_arrow(sub["a"]).astype(np.uint64)
            if kind == "p":
                kb = url_hash64_arrow(sub["b"]).astype(np.uint64)
                key = (ka * _GOLD) ^ kb
            else:
                key = ka
            return pa.table(
                {
                    "a": sub["a"],
                    "b": sub["b"],
                    "n": sub["n"],
                    "key": pa.array(key.astype(np.int64), pa.int64()),
                }
            )

        return fn

    def sum_part(tbl: pa.Table) -> pa.Table:
        g = (
            tbl.select(["a", "b", "n"])
            .to_pandas()
            .groupby(["a", "b"], as_index=False)["n"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = _coarse_group_apply(
        both.map_batches(keyed("p"), batch_format="pyarrow"),
        "key",
        sum_part,
        num_parts=num_parts,
    )
    counts = _coarse_group_apply(
        both.map_batches(keyed("c"), batch_format="pyarrow"),
        "key",
        sum_part,
        num_parts=num_parts,
    )

    def pair_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host_a": batch["a"].cast(pa.string()),
                "host_b": batch["b"].cast(pa.string()),
                "shared": batch["n"].cast(pa.int64()),
                "ka": pa.array(
                    url_hash64_arrow(batch["a"]).astype(np.int64),
                    pa.int64(),
                ),
                "kb": pa.array(
                    url_hash64_arrow(batch["b"]).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def count_side(name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    f"k_{name}": pa.array(
                        url_hash64_arrow(batch["a"]).astype(np.int64),
                        pa.int64(),
                    ),
                    name: batch["n"].cast(pa.int64()),
                }
            )

        return fn

    counts = counts.materialize()  # consumed by both joins
    j1 = hash_join(
        pairs.map_batches(pair_side, batch_format="pyarrow"),
        counts.map_batches(count_side("n_a"), batch_format="pyarrow"),
        left_key="ka",
        right_key="k_n_a",
        num_parts=num_parts,
    )
    j2 = hash_join(
        j1,
        counts.map_batches(count_side("n_b"), batch_format="pyarrow"),
        left_key="kb",
        right_key="k_n_b",
        num_parts=num_parts,
    )

    def finish(df: "pd.DataFrame") -> pa.Table:
        shared = df["shared"].to_numpy(np.int64)
        na = df["n_a"].to_numpy(np.int64)
        nb = df["n_b"].to_numpy(np.int64)
        keep = den * shared >= num * np.minimum(na, nb)
        sub = df[keep]
        return pa.table(
            {
                "host_a": pa.array(sub["host_a"].to_numpy(object), pa.string()),
                "host_b": pa.array(sub["host_b"].to_numpy(object), pa.string()),
                "shared": pa.array(sub["shared"].to_numpy(np.int64), pa.int64()),
                "n_a": pa.array(sub["n_a"].to_numpy(np.int64), pa.int64()),
                "n_b": pa.array(sub["n_b"].to_numpy(np.int64), pa.int64()),
            }
        )

    return j2.map_batches(finish, batch_format="pandas")
