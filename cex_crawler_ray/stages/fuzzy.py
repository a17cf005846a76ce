"""Edit-distance-1 fuzzy matching via FastSS deletion-neighborhood
blocking (Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries").

Two strings are within Levenshtein distance 1 iff one can be obtained
from the other by a single substitution, insertion, or deletion — and
in every such case their depth-1 deletion neighborhoods (the string
itself plus every single-character deletion) share a member.  So:

1. ``map_batches``: reduce to distinct values per batch, emit one
   (variant_hash, value) row per neighborhood member (len+1 rows per
   value — the blocking fan-out is linear in string length, never
   quadratic in vocabulary).
2. coarse-partition on ``variant_hash``, all-pairs inside each bucket
   (buckets are near-singletons for natural text), verify with a real
   banded edit-distance kernel, partition-local dedupe.
3. global distinct over the verified pairs.

The same LSH-shaped pipeline as ``stages/dedup.py``'s near-dup path —
blocking, bucket pairing, exact verify — applied to short strings
(vocabulary / entity names) instead of documents.  The verify runs on
the pair rows themselves (values travel with their bucket), so no
driver dict and no text join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .dedup import _coarse_group_apply, _hash64


def edit1_within(a: str, b: str) -> bool:
    """True iff Levenshtein(a, b) <= 1 (O(len) two-pointer check)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # now la <= lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if i == la:
        return True  # prefix: equal or one trailing insert
    if la == lb:
        # one substitution at i, rest must match
        return a[i + 1 :] == b[i + 1 :]
    # one insertion in b at i
    return a[i:] == b[i + 1 :]


def _deletion_variants(s: str) -> list[str]:
    return [s] + [s[:i] + s[i + 1 :] for i in range(len(s))]


def edit1_pairs(
    ds: "ray.data.Dataset",
    col: str,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Distinct value pairs (val_a < val_b) with Levenshtein distance
    exactly 1 (distance 0 cannot occur between distinct values)."""

    def explode(batch: pa.Table) -> pa.Table:
        vals = set(batch[col].to_pylist())
        hs: list[int] = []
        vs: list[str] = []
        for v in vals:
            for var in _deletion_variants(v):
                hs.append(_hash64(var))
                vs.append(v)
        return pa.table(
            {
                "variant_hash": pa.array(hs, pa.uint64()),
                "val": pa.array(vs, pa.string()),
            }
        )

    def pairs_in_part(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        out_a: list[str] = []
        out_b: list[str] = []
        seen: set[tuple[str, str]] = set()
        for _, grp in df.groupby("variant_hash", sort=False):
            vals = sorted(set(grp["val"]))
            if len(vals) < 2:
                continue
            for i in range(len(vals)):
                for j in range(i + 1, len(vals)):
                    p = (vals[i], vals[j])
                    if p in seen:
                        continue
                    seen.add(p)
                    if edit1_within(*p):
                        out_a.append(p[0])
                        out_b.append(p[1])
        return pa.table(
            {
                "val_a": pa.array(out_a, pa.string()),
                "val_b": pa.array(out_b, pa.string()),
            }
        )

    cand = _coarse_group_apply(
        ds.map_batches(explode, batch_format="pyarrow"),
        "variant_hash",
        pairs_in_part,
        num_parts,
    )

    # global distinct on the verified pairs (the same pair can verify in
    # several buckets — one per shared variant)
    def add_key(batch: pa.Table) -> pa.Table:
        keys = [
            _hash64(a + "\x00" + b)
            for a, b in zip(
                batch["val_a"].to_pylist(), batch["val_b"].to_pylist()
            )
        ]
        return batch.append_column(
            "pair_key", pa.array(keys, pa.uint64())
        )

    def drop_dups(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["val_a", "val_b"])
        return pa.Table.from_pandas(
            df[["val_a", "val_b"]], preserve_index=False
        )

    return _coarse_group_apply(
        cand.map_batches(add_key, batch_format="pyarrow"),
        "pair_key",
        drop_dups,
        num_parts,
    )
