"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the curation operators a 100 TB text pipeline needs.

Scale design notes (each documented per stage):
* exact: hash-partitioned ``groupby(text_hash)`` + first-per-group — the
  only all-to-all, and it shuffles (id, 16-byte hash), never text.
* MinHash/LSH: per-batch signature computation (vectorized numpy) ->
  explode to (band_hash, doc) pairs -> ``groupby(band_hash)`` ->
  candidate pairs inside buckets -> verify.  Shuffle carries band keys,
  not documents.
* SimHash: 64-bit signatures, banded into 4x16-bit keys for blocking.
* embedding: blocked matmul against a ``ray.put``-broadcast matrix
  (small side broadcast once, not per batch).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


# ---------------------------------------------------------------- exact
def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct text; adds ``n_copies``.

    Hash-partition semantics: a 64-bit content hash is the groupby key,
    so the shuffle moves (id, hash) pairs; text only rides along inside
    each group (needed for output).  At 100 TB you would groupby on the
    hash alone and re-join — here text is small enough to carry.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        h = pa.array(
            [_hash64(t) for t in batch[text_col].to_pylist()], pa.uint64()
        )
        return batch.append_column("text_hash", h)

    def first_per_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        first = group.take(order[:1])
        return first.append_column(
            "n_copies", pa.array([group.num_rows], pa.int64())
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(first_per_group, batch_format="pyarrow")
    )


# -------------------------------------------------------------- minhash
_SHINGLE_RE = re.compile(r"\s+")

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Vectorized MinHash signatures over character shingles.

    Stateful-stage pattern: permutation parameters are built ONCE in
    ``__init__`` (per worker), signatures per batch in ``__call__``.
    """

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 5,
        seed: int = 42,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def shingle_hashes(self, text: str) -> np.ndarray:
        t = _SHINGLE_RE.sub(" ", text)
        if len(t) < self.k:
            t = t + " " * (self.k - len(t))
        sh = {t[i : i + self.k] for i in range(len(t) - self.k + 1)}
        return np.fromiter(
            (_hash64(s) for s in sh), dtype=np.uint64, count=len(sh)
        )

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        # (a*h + b) mod p, min over shingles, per permutation
        vals = (
            self.a[:, None] * (h[None, :] % _MERSENNE) + self.b[:, None]
        ) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.signature(t) for t in batch[self.text_col].to_pylist()
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "signature": pa.array(
                    [s.tolist() for s in sigs], pa.list_(pa.uint64())
                ),
            }
        )


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Candidate near-dup pairs via banded LSH.

    pipeline: signatures (stateful map_batches) -> explode one row per
    band (band_hash = hash of the band's signature slice) ->
    ``groupby(band_hash)`` -> all pairs within a bucket -> distinct.
    Returns (id_a, id_b) with id_a < id_b — candidates only; callers
    verify with true Jaccard / exact equality.
    """
    rows_per_band = num_perm // bands

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids, band_keys = [], []
        for i, sig in zip(
            batch[id_col].to_pylist(), batch["signature"].to_pylist()
        ):
            for b in range(bands):
                sl = sig[b * rows_per_band : (b + 1) * rows_per_band]
                key = _hash64(f"{b}:" + ",".join(map(str, sl)))
                ids.append(i)
                band_keys.append(key)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "band_key": pa.array(band_keys, pa.uint64()),
            }
        )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(set(group[id_col].to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={
                "num_perm": num_perm,
                "shingle_k": shingle_k,
                "text_col": text_col,
                "id_col": id_col,
            },
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(explode_bands, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
    # distinct pairs (same pair can fire in several bands)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """True k-gram Jaccard similarity (verification kernel)."""
    ta = _SHINGLE_RE.sub(" ", text_a)
    tb = _SHINGLE_RE.sub(" ", text_b)
    sa = {ta[i : i + k] for i in range(max(1, len(ta) - k + 1))}
    sb = {tb[i : i + k] for i in range(max(1, len(tb) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# -------------------------------------------------------------- simhash
class SimHasher:
    """64-bit SimHash over character shingles (Charikar'02)."""

    def __init__(self, shingle_k: int = 5, text_col: str = "text", id_col: str = "doc_id"):
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def simhash(self, text: str) -> int:
        t = _SHINGLE_RE.sub(" ", text)
        if len(t) < self.k:
            t = t + " " * (self.k - len(t))
        acc = np.zeros(64, dtype=np.int64)
        seen = {t[i : i + self.k] for i in range(len(t) - self.k + 1)}
        for s in seen:
            h = _hash64(s)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for bit in np.nonzero(acc > 0)[0]:
            out |= 1 << int(bit)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.simhash(t) for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(sigs, pa.uint64()),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, text_col="text", id_col="doc_id"):
    """Near-dup candidates: block on 4x16-bit simhash bands (any pair
    within hamming distance <= 3 of a 64-bit hash agrees on at least one
    of 4 bands), verify hamming distance inside buckets."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, keys, sigs = [], [], []
        for i, s in zip(
            batch[id_col].to_pylist(), batch["simhash"].to_pylist()
        ):
            for b in range(4):
                ids.append(i)
                keys.append((b << 16) | ((s >> (16 * b)) & 0xFFFF))
                sigs.append(s)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "band_key": pa.array(keys, pa.int64()),
                "simhash": pa.array(sigs, pa.uint64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            set(
                zip(
                    group[id_col].to_pylist(), group["simhash"].to_pylist()
                )
            )
        )
        a_out, b_out, d_out = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = int(rows[i][1] ^ rows[j][1]).bit_count()
                if d <= max_hamming:
                    a_out.append(rows[i][0])
                    b_out.append(rows[j][0])
                    d_out.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(d_out, pa.int64()),
            }
        )

    cand = (
        ds.map_batches(
            SimHasher,
            fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(pairs, batch_format="pyarrow")
    )
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ------------------------------------------------------------ embedding
def embedding_dup_pairs(ds, threshold: float = 0.999, id_col: str = "vec_id"):
    """Near-dup pairs by cosine similarity >= threshold.

    The full matrix is broadcast ONCE via ``ray.put`` (embeddings are
    the small side at curation time); each batch does one numpy matmul
    against it — no per-batch reshipping, no shuffle.  For corpora where
    the matrix exceeds worker memory, swap the broadcast for the LSH
    bucketing in similarity.py.
    """
    all_rows = ds.select_columns([id_col, "embedding"]).take_all()
    ids = np.array([r[id_col] for r in all_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in all_rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True) + 1e-300
    ids_ref = ray.put(ids)
    mat_ref = ray.put(mat)

    def pairs_batch(batch: pa.Table) -> pa.Table:
        other_ids = ray.get(ids_ref)
        other = ray.get(mat_ref)
        a_ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        q = np.stack(
            [np.asarray(e, dtype=np.float64) for e in batch["embedding"].to_pylist()]
        )
        q /= np.linalg.norm(q, axis=1, keepdims=True) + 1e-300
        sims = q @ other.T
        ai, bj = np.nonzero(sims >= threshold)
        keep = a_ids[ai] < other_ids[bj]  # dedupe + drop self-pairs
        return pa.table(
            {
                "id_a": pa.array(a_ids[ai][keep], pa.int64()),
                "id_b": pa.array(other_ids[bj][keep], pa.int64()),
            }
        )

    return ds.map_batches(pairs_batch, batch_format="pyarrow")
