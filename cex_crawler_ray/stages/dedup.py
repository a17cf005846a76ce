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
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .similarity import col_to_numpy, stack_list_column


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


# Coarse-partition pattern: Ray's groupby().map_groups() pays a Python
# call per group, which collapses when groups are tiny and numerous
# (e.g. 90k near-singleton LSH buckets).  Instead we shuffle on
# ``key % num_parts`` and run a VECTORIZED per-partition function that
# does the fine-grained grouping locally (pandas/arrow) — same result,
# O(num_parts) group calls.  num_parts bounds per-task memory at scale.
def _coarse_group_apply(ds, key_col: str, fn, num_parts: int = 64):
    def add_part(batch: pa.Table) -> pa.Table:
        # mask in the key's own signedness: num_parts is a power of
        # two, so two's-complement low bits land in [0, num_parts)
        # for negative int64 keys too (the old unconditional uint64
        # cast raised on any negative key — e.g. hash-mixed pair
        # keys), while uint64 keys >= 2^63 must NOT be cast to int64
        col = batch[key_col].combine_chunks()
        if pa.types.is_unsigned_integer(col.type):
            part = pc.cast(
                pc.bit_wise_and(
                    col.cast(pa.uint64()),
                    pa.scalar(np.uint64(num_parts - 1), pa.uint64()),
                ),
                pa.int64(),
            )
        else:
            part = pc.bit_wise_and(
                col.cast(pa.int64()),
                pa.scalar(np.int64(num_parts - 1), pa.int64()),
            )
        return batch.append_column("_part", part)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda g: fn(g.drop_columns(["_part"])), batch_format="pyarrow"
        )
    )


def driver_merge_sum(partials_ds, key_cols, val_cols):
    """Merge per-block aggregate PARTIALS on the driver (one pandas
    groupby-sum over the concatenated blocks) instead of paying a Ray
    shuffle round first.

    Use ONLY when the merged aggregate is driver-bound anyway — a
    broadcast lookup table, prefix offsets, or a final small result.
    The driver then holds <= keys x blocks partial rows instead of
    keys rows: the same asymptotic contract (both require keys to be
    driver-sized), minus an all-to-all exchange whose output was about
    to be ``ray.get``-collected regardless.  Measured: each swapped
    site dropped ~1.5-2 s of fixed shuffle latency at sf0.1.
    """
    import pandas as pd

    key_cols = list(key_cols)
    val_cols = list(val_cols)
    tbl = pa.concat_tables(
        ray.get(partials_ds.to_arrow_refs()), promote_options="default"
    )
    df = tbl.select(key_cols + val_cols).to_pandas()
    if len(df) == 0:
        return df
    return df.groupby(key_cols, as_index=False)[val_cols].sum()


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

    def dedup_part(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        g = df.sort_values(id_col).groupby("text_hash", sort=False)
        firsts = g.head(1).copy()
        firsts["n_copies"] = g.size().reindex(
            firsts["text_hash"]
        ).to_numpy()
        return pa.Table.from_pandas(firsts, preserve_index=False)

    return _coarse_group_apply(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        "text_hash",
        dedup_part,
    )


# -------------------------------------------------------------- minhash
_SHINGLE_RE = re.compile(r"\s+")

_MERSENNE = (1 << 61) - 1

# polynomial rolling-hash base (odd 64-bit constant); shingle hashes are
# computed fully vectorized: sliding char-code windows @ powers, with
# natural uint64 wraparound — deterministic across processes, no per-
# shingle digest calls
_POLY_BASE = np.uint64(1099511628211)


def shingle_hashes_vec(text: str, k: int) -> np.ndarray:
    """Unique k-gram hashes of ``text`` (whitespace collapsed), vectorized."""
    t = _SHINGLE_RE.sub(" ", text)
    if len(t) < k:
        t = t + " " * (k - len(t))
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    powers = _POLY_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        windows = np.lib.stride_tricks.sliding_window_view(codes, k)
        hashes = (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(hashes)


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
        return shingle_hashes_vec(text, self.k)

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


def minhash_band_rows(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """(doc, band_key) rows: signatures (vectorized, worker-global
    hasher) exploded one row per band.  The unit of the persistent
    near-dup index — band rows are what an incremental run stores and
    re-reads instead of recomputing signatures."""
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

    # stateless tasks + a worker-process-global MinHasher (permutation
    # params are pure functions of the config): same amortization as an
    # actor pool without per-execution actor startup (~2-4 s each run)
    mh_cfg = (num_perm, shingle_k, text_col, id_col)

    def signatures(batch: pa.Table) -> pa.Table:
        return _global_minhasher(mh_cfg)(batch)

    return ds.map_batches(signatures, batch_format="pyarrow").map_batches(
        explode_bands, batch_format="pyarrow"
    )


def pairs_from_band_rows(band_ds, id_col: str = "doc_id"):
    """Candidate pairs from (doc, band_key) rows: coarse-partitioned
    bucket pairing + global distinct — shared by the one-shot and the
    incremental-index paths."""

    def pairs_in_part(part: pa.Table) -> pa.Table:
        # vectorized: local group by band_key, numpy triu pairs per
        # bucket, then a PARTITION-LOCAL dedupe — the same candidate
        # pair surfaces in up to ``bands`` buckets, and cutting those
        # duplicates here (instead of in the global _distinct_pairs
        # shuffle) shrinks the pair shuffle by up to 16x
        df = part.to_pandas()
        out_a, out_b = [], []
        for _, grp in df.groupby("band_key", sort=False):
            if len(grp) < 2:
                continue
            ids = np.unique(grp[id_col].to_numpy())
            if len(ids) < 2:
                continue
            ai, bj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ai])
            out_b.append(ids[bj])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        rec = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
        rec["a"], rec["b"] = a, b
        rec = np.unique(rec)
        return pa.table(
            {
                "id_a": pa.array(rec["a"], pa.int64()),
                "id_b": pa.array(rec["b"], pa.int64()),
            }
        )

    pairs = _coarse_group_apply(band_ds, "band_key", pairs_in_part)
    return _distinct_pairs(pairs)


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
    return pairs_from_band_rows(
        minhash_band_rows(ds, num_perm, bands, shingle_k, text_col, id_col),
        id_col=id_col,
    )


def minhash_lsh_pairs_incremental(
    corpus,
    index_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Persistent-index LSH: the dedup analog of the reseeded crawl
    (reference cron model ``run.sh:5-6``).

    The index directory holds (doc_id, band_key) rows from every prior
    run, one ``gen=k`` parquet generation per invocation.  A new run
    (1) reads only the indexed doc_ids (column-pruned), (2) computes
    signatures ONLY for corpus docs not yet indexed (broadcast
    sorted-id anti-join inside ``map_batches``), (3) appends the new
    band rows as the next generation — written by the workers — and
    (4) returns the pair set of the FULL band table (stored + new),
    which equals a from-scratch ``minhash_lsh_pairs`` over the grown
    corpus.  The expensive stage (shingle/minhash signatures) runs
    once per document ever; the bucket pairing re-runs per invocation
    over (id, band_key) rows only — 16 ints/doc, never text.
    """
    import glob as _glob

    os.makedirs(index_dir, exist_ok=True)
    gens = sorted(_glob.glob(os.path.join(index_dir, "gen=*")))
    files = [
        f
        for g in gens
        for f in sorted(_glob.glob(os.path.join(g, "*.parquet")))
    ]
    if files:
        import pyarrow.parquet as _pq

        known = np.unique(
            np.concatenate(
                [
                    col_to_numpy(
                        _pq.read_table(f, columns=[id_col])[id_col],
                        np.int64,
                    )
                    for f in files
                ]
            )
        )
    else:
        known = np.zeros(0, dtype=np.int64)
    known_ref = ray.put(known)  # sorted by np.unique

    def only_new(batch: pa.Table) -> pa.Table:
        kn = ray.get(known_ref)
        if len(kn) == 0 or batch.num_rows == 0:
            return batch
        ids = col_to_numpy(batch[id_col], np.int64)
        pos = np.searchsorted(kn, ids)
        pos[pos >= len(kn)] = 0
        return batch.filter(pa.array(kn[pos] != ids))

    new_bands = minhash_band_rows(
        corpus.map_batches(only_new, batch_format="pyarrow"),
        num_perm,
        bands,
        shingle_k,
        text_col,
        id_col,
    )
    gen_dir = os.path.join(index_dir, f"gen={len(gens)}")
    new_bands.write_parquet(gen_dir)

    band_union = ray.data.read_parquet(index_dir)
    return pairs_from_band_rows(band_union, id_col=id_col)


_STAGE_CACHE: dict = {}


def _global_minhasher(cfg):
    inst = _STAGE_CACHE.get(("minhash", cfg))
    if inst is None:
        inst = MinHasher(
            num_perm=cfg[0], shingle_k=cfg[1], text_col=cfg[2], id_col=cfg[3]
        )
        _STAGE_CACHE[("minhash", cfg)] = inst
    return inst


def _global_simhasher(cfg):
    inst = _STAGE_CACHE.get(("simhash", cfg))
    if inst is None:
        inst = SimHasher(shingle_k=cfg[0], text_col=cfg[1], id_col=cfg[2])
        _STAGE_CACHE[("simhash", cfg)] = inst
    return inst


def _distinct_pairs(pairs):
    """Distinct (id_a, id_b) rows: coarse-partition on a pair hash, then
    a vectorized local drop_duplicates."""

    def add_key(batch: pa.Table) -> pa.Table:
        a = col_to_numpy(batch["id_a"], np.uint64)
        b = col_to_numpy(batch["id_b"], np.uint64)
        key = a * np.uint64(0x9E3779B97F4A7C15) + b
        return batch.append_column("pair_key", pa.array(key, pa.uint64()))

    def drop_dups(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates(subset=["id_a", "id_b"])
        return pa.Table.from_pandas(
            df.drop(columns=["pair_key"]), preserve_index=False
        )

    def fn(part: pa.Table) -> pa.Table:
        return drop_dups(part)

    return _coarse_group_apply(
        pairs.map_batches(add_key, batch_format="pyarrow"), "pair_key", fn
    )


def attach_pair_texts(
    pairs, corpus, id_col: str = "doc_id", text_col: str = "text"
):
    """Join candidate (id_a, id_b) pairs back to the corpus on id —
    twice, once per side — yielding (id_a, id_b, text_a, text_b).

    This is the scale shape for candidate verification: two
    co-partition hash joins whose volume is the CANDIDATE set (plus the
    corpus id/text columns through the shuffle), never a driver-side
    doc_id -> text dict of the whole corpus.
    """
    from .join import hash_join

    side = corpus.select_columns([id_col, text_col])

    def _rename(ds, new_text):
        def fn(batch: pa.Table) -> pa.Table:
            cols = [
                c for c in batch.column_names if c not in (id_col, text_col)
            ]
            out = batch.select(cols + [text_col])
            return out.rename_columns(cols + [new_text])

        return ds.map_batches(fn, batch_format="pyarrow")

    j1 = _rename(
        hash_join(pairs, side, "id_a", id_col), "text_a"
    )
    j2 = _rename(
        hash_join(j1, side, "id_b", id_col), "text_b"
    )
    return j2


def _materialize_pairs(pairs) -> pa.Table:
    if isinstance(pairs, pa.Table):
        return pairs
    tables = [ray.get(r) for r in pairs.to_arrow_refs()]
    # empty blocks of a fused pandas map_groups stage can surface as
    # DataFrames even through to_arrow_refs — normalize before sizing
    tables = [
        t
        if isinstance(t, pa.Table)
        else pa.Table.from_pandas(t, preserve_index=False)
        for t in tables
    ]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).combine_chunks()


def _candidate_texts(pairs_tbl: pa.Table, corpus, id_col, text_col) -> dict:
    """id -> text for exactly the ids appearing in candidate pairs: a
    broadcast sorted-id membership scan of the corpus (one pass, no
    shuffle).  The lookup is bounded by the CANDIDATE set — 2 x npairs
    texts — never the corpus (the round-1 driver dict held every doc).
    For candidate sets too large even for that, ``attach_pair_texts``
    is the co-partition-join alternative."""
    ids = np.unique(
        np.concatenate(
            [
                col_to_numpy(pairs_tbl["id_a"], np.int64),
                col_to_numpy(pairs_tbl["id_b"], np.int64),
            ]
        )
    )
    if len(ids) == 0:
        return {}
    ref = ray.put(ids)  # already sorted by np.unique

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        h = col_to_numpy(batch[id_col], np.int64)
        pos = np.searchsorted(wanted, h)
        pos[pos >= len(wanted)] = 0
        return batch.select([id_col, text_col]).filter(
            pa.array(wanted[pos] == h)
        )

    rows = corpus.map_batches(pick, batch_format="pyarrow").take_all()
    return {r[id_col]: r[text_col] for r in rows}


# Above this many candidate pairs the verify routes through the
# co-partition join instead of materializing the pair table + candidate
# texts on the driver.  Below it, the broadcast scan is measurably
# faster at sandbox scale (one corpus pass vs two shuffle joins); the
# join path is the 100-TB shape where a dup-heavy corpus can emit 10^8
# candidates.  Budget math for the threshold: 10^6 pairs = 16 MB of
# int64 ids on the driver plus <= 2x10^6 candidate texts — two orders
# of magnitude under the 10^8-pair OOM scenario the join path exists
# for, and the measured crossover is far above it (at 664k pairs the
# broadcast verify is ~8x faster than the join).
VERIFY_BROADCAST_MAX_PAIRS = 1_000_000


def _prepare_pairs(pairs, broadcast_max_pairs):
    """Normalize the candidate side and pick the verify path.

    Returns (pairs_materialized, use_join).  A Dataset is materialized
    (blocks stay distributed in the object store) so the count comes
    from metadata and neither path re-executes the LSH pipeline."""
    limit = (
        VERIFY_BROADCAST_MAX_PAIRS
        if broadcast_max_pairs is None
        else broadcast_max_pairs
    )
    if isinstance(pairs, pa.Table):
        return pairs, pairs.num_rows > limit
    pairs = pairs.materialize()
    return pairs, pairs.count() > limit


def _verified_join(pairs, corpus, keep_fn, id_col, text_col):
    """Scale path: candidate pairs -> co-partition joins back to the
    corpus (``attach_pair_texts``) -> vectorized per-batch verify.
    Only the VERIFIED pair ids (the result) ever reach the driver —
    no candidate pair table, no id->text dict."""
    if isinstance(pairs, pa.Table):
        pairs = ray.data.from_arrow(pairs)
    joined = attach_pair_texts(pairs, corpus, id_col=id_col, text_col=text_col)
    out = joined.map_batches(keep_fn, batch_format="pyarrow")
    return _materialize_pairs(out).select(["id_a", "id_b"])


def _verified_join_exact(pairs, corpus, id_col, text_col):
    """Equality-only scale path: the corpus is mapped once to
    (id, blake2b-128 text hash) and the two co-partition joins carry
    16-byte hex digests instead of document texts — the exchanges are
    pair-count-sized with O(1) payloads, and the equality filter
    compares fixed-width strings.  Collision probability at 128 bits is
    ~1e-20 at 10^9 docs; byte-identical semantics in every practical
    sense (the same contract as ``exact_dedup``'s hash groupby)."""
    if isinstance(pairs, pa.Table):
        pairs = ray.data.from_arrow(pairs)

    def to_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.blake2b(t.encode("utf-8"), digest_size=16).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                text_col: pa.array(hs, pa.string()),
            }
        )

    hashed = corpus.map_batches(to_hash, batch_format="pyarrow")
    joined = attach_pair_texts(pairs, hashed, id_col=id_col, text_col=text_col)

    def keep_eq(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["text_a"], batch["text_b"])
        return batch.filter(pc.fill_null(keep, False)).select(
            ["id_a", "id_b"]
        )

    out = joined.map_batches(keep_eq, batch_format="pyarrow")
    return _materialize_pairs(out).select(["id_a", "id_b"])


def verify_pairs_exact(
    pairs, corpus, id_col="doc_id", text_col="text",
    broadcast_max_pairs: int | None = None,
):
    """Keep only candidate pairs whose texts are byte-identical.

    Verification volume scales with the candidate set.  Below
    ``broadcast_max_pairs`` (default ``VERIFY_BROADCAST_MAX_PAIRS``)
    candidate ids are broadcast and one corpus scan picks their texts;
    above it the verify is two co-partition hash joins + a vectorized
    equality filter, so nothing candidate-sized touches the driver.
    Pass ``broadcast_max_pairs=0`` to force the join path."""
    import pandas as pd

    pairs, use_join = _prepare_pairs(pairs, broadcast_max_pairs)
    if use_join:
        return _verified_join_exact(pairs, corpus, id_col, text_col)
    pairs_tbl = _materialize_pairs(pairs)
    texts = _candidate_texts(pairs_tbl, corpus, id_col, text_col)
    ta = pd.Series(pairs_tbl["id_a"].to_pylist()).map(texts)
    tb = pd.Series(pairs_tbl["id_b"].to_pylist()).map(texts)
    keep = (ta == tb) & ta.notna()
    return pairs_tbl.filter(pa.array(keep.to_numpy())).select(
        ["id_a", "id_b"]
    )


def verify_pairs_jaccard(
    pairs, corpus, min_jaccard: float = 0.8, k: int = 5,
    id_col="doc_id", text_col="text",
    broadcast_max_pairs: int | None = None,
):
    """Keep only candidate pairs whose TRUE k-gram Jaccard >= threshold
    (same threshold-switched verify as ``verify_pairs_exact``: broadcast
    scan below ``broadcast_max_pairs`` candidates, co-partition join
    above)."""
    pairs, use_join = _prepare_pairs(pairs, broadcast_max_pairs)
    if use_join:
        def keep_jac(batch: pa.Table) -> pa.Table:
            keep = [
                ngram_jaccard(a, b, k) >= min_jaccard
                for a, b in zip(
                    batch["text_a"].to_pylist(), batch["text_b"].to_pylist()
                )
            ]
            return batch.filter(pa.array(keep)).select(["id_a", "id_b"])

        return _verified_join(pairs, corpus, keep_jac, id_col, text_col)
    pairs_tbl = _materialize_pairs(pairs)
    texts = _candidate_texts(pairs_tbl, corpus, id_col, text_col)
    keep = [
        ngram_jaccard(texts[a], texts[b], k) >= min_jaccard
        for a, b in zip(
            pairs_tbl["id_a"].to_pylist(), pairs_tbl["id_b"].to_pylist()
        )
    ]
    return pairs_tbl.filter(pa.array(keep)).select(["id_a", "id_b"])


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
        h = shingle_hashes_vec(text, self.k)
        # (n_shingles x 64) bit matrix, fully vectorized
        bits = (
            h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]
        ) & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
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


def hamming_band_pairs(
    sig_ds,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
):
    """All id pairs whose 64-bit signatures are within ``max_hamming``
    (<= 3): block on 4x16-bit bands (pigeonhole: hamming <= 3 pairs
    agree on at least one band), verify popcount inside buckets.
    Shared by simhash text dedup and perceptual-hash image dedup —
    anything that reduces an item to a 64-bit locality-sensitive sig.
    """

    def explode(batch: pa.Table) -> pa.Table:
        ids, keys, sigs = [], [], []
        for i, s in zip(
            batch[id_col].to_pylist(), batch[sig_col].to_pylist()
        ):
            for b in range(4):
                ids.append(i)
                keys.append((b << 16) | ((s >> (16 * b)) & 0xFFFF))
                sigs.append(s)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "band_key": pa.array(keys, pa.int64()),
                sig_col: pa.array(sigs, pa.uint64()),
            }
        )

    def pairs_in_part(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        a_out, b_out, d_out = [], [], []
        for _, grp in df.groupby("band_key", sort=False):
            if len(grp) < 2:
                continue
            rows = sorted(set(zip(grp[id_col], grp[sig_col])))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    d = int(int(rows[i][1]) ^ int(rows[j][1])).bit_count()
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

    cand = _coarse_group_apply(
        sig_ds.map_batches(explode, batch_format="pyarrow"),
        "band_key",
        pairs_in_part,
    )
    return _distinct_pairs(cand)


def simhash_pairs(ds, max_hamming: int = 3, text_col="text", id_col="doc_id"):
    """Near-dup candidates: block on 4x16-bit simhash bands (any pair
    within hamming distance <= 3 of a 64-bit hash agrees on at least one
    of 4 bands), verify hamming distance inside buckets."""
    sh_cfg = (5, text_col, id_col)

    def signatures(batch: pa.Table) -> pa.Table:
        return _global_simhasher(sh_cfg)(batch)

    return hamming_band_pairs(
        ds.map_batches(signatures, batch_format="pyarrow"),
        id_col=id_col,
        sig_col="simhash",
        max_hamming=max_hamming,
    )


# ------------------------------------------------------------ embedding
_GRID_PRIMES = np.array(
    [
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x27D4EB2F165667C5,
    ],
    dtype=np.uint64,
)

_GRID_PLANES_CACHE: dict = {}


def _grid_planes(dim: int, proj_dims: int) -> np.ndarray:
    """Fixed random unit projection vectors (seeded; memoized per
    worker process)."""
    key = (dim, proj_dims)
    if key not in _GRID_PLANES_CACHE:
        rng = np.random.RandomState(17)
        p = rng.randn(proj_dims, dim)
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        _GRID_PLANES_CACHE[key] = p
    return _GRID_PLANES_CACHE[key]


def embedding_dup_pairs(
    ds,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    proj_dims: int = 2,
    num_parts: int = 64,
):
    """Near-dup pairs by cosine similarity >= threshold — EXACT result
    via lossless grid blocking (no all-pairs, no driver materialization).

    cos(a,b) >= t on unit vectors means ||a-b|| <= eps = sqrt(2-2t)
    (eps ≈ 0.045 at t=0.999).  Projection onto a unit vector is
    1-Lipschitz, so a qualifying pair differs by <= eps per projected
    coordinate — i.e. by <= 1 grid cell of width eps.  Each point is
    emitted to its 3^proj_dims neighbor cells; any qualifying pair
    therefore shares at least one cell (b's home cell is in a's
    neighborhood and vice versa), where an exact in-cell cosine verify
    keeps only true pairs.  The shuffle carries 3^proj_dims copies of
    (id, embedding) — bounded blowup — and cell population bounds
    per-task work; raise ``proj_dims`` to shrink cells at larger scale.

    ``embedding_dup_pairs_broadcast`` remains for corpora small enough
    to broadcast whole.
    """
    import itertools

    eps = float(np.sqrt(max(2.0 - 2.0 * threshold, 1e-12)))
    offsets = list(itertools.product((-1, 0, 1), repeat=proj_dims))
    primes = _GRID_PRIMES[:proj_dims]

    def explode_cells(batch: pa.Table) -> pa.Table:
        m = stack_list_column(batch[emb_col])
        m = m / (np.linalg.norm(m, axis=1, keepdims=True) + 1e-300)
        planes = _grid_planes(m.shape[1], proj_dims)
        base = np.floor((m @ planes.T) / eps).astype(np.int64)
        parts = []
        for off in offsets:
            c = (base + np.asarray(off, dtype=np.int64)).astype(np.uint64)
            with np.errstate(over="ignore"):
                key = (c * primes[None, :]).sum(axis=1, dtype=np.uint64)
            parts.append(
                pa.table(
                    {
                        id_col: batch[id_col],
                        "cell_key": pa.array(key, pa.uint64()),
                        emb_col: batch[emb_col],
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs_in_part(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        a_out, b_out = [], []
        for _, grp in df.groupby("cell_key", sort=False):
            grp = grp.drop_duplicates(subset=[id_col])
            if len(grp) < 2:
                continue
            ids = grp[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(
                [np.asarray(e, dtype=np.float64) for e in grp[emb_col]]
            )
            mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-300)
            sims = mat @ mat.T
            ai, bj = np.nonzero(np.triu(sims >= threshold, 1))
            lo = np.minimum(ids[ai], ids[bj])
            hi = np.maximum(ids[ai], ids[bj])
            a_out.extend(lo.tolist())
            b_out.extend(hi.tolist())
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
            }
        )

    exploded = ds.select_columns([id_col, emb_col]).map_batches(
        explode_cells, batch_format="pyarrow"
    )
    cand = _coarse_group_apply(
        exploded, "cell_key", pairs_in_part, num_parts=num_parts
    )
    return _distinct_pairs(cand)


def embedding_dup_pairs_broadcast(
    ds, threshold: float = 0.999, id_col: str = "vec_id"
):
    """Near-dup pairs by cosine similarity >= threshold — broadcast
    variant for corpora whose full matrix fits a worker (the matrix is
    ``ray.put`` once; each batch does one matmul against it).  Use the
    grid-blocked ``embedding_dup_pairs`` at scale.
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


# ------------------------------------------------- sorted neighborhood
def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    key_col: str,
    attr_col: str,
    window: int = 4,
    rows_per_bucket: int = 4096,
    bucket_shift: int = 40,
    num_parts: int = 64,
) -> "ray.data.Dataset":
    """Sorted-neighborhood blocking (Hernandez & Stolfo 1995): rank all
    rows by ``(key, id)`` and emit every candidate pair within
    ``window`` positions — the classic entity-resolution blocking
    method for typo-adjacent records that hash blocking scatters.

    No global sort and no driver rows: pass 1 is the ordered-bucket
    rank of ``window.global_row_number`` (per-block counts per ordered
    ``key >> bucket_shift`` bucket -> driver prefix offsets -> in-bucket
    exact lexsort positions); pass 2 regroups by rank-bucket
    ``rn // rows_per_bucket``, copying each bucket's ``window - 1``
    tail rows into the next bucket so boundary pairs are caught, then
    expands pairs vectorized (one shifted slice per distance).  A pair
    is emitted only in the second row's native bucket — exactly once.
    The exchanges carry (id, key, attr, rank) rows; pair volume is
    ``(window - 1) x n``, independent of skew.

    ``key_col`` must be a non-negative int64 whose order is the
    intended lexicographic order (e.g. a big-endian string-prefix
    int); ``attr_col`` rides along for the caller's verify predicate.
    Requires ``window <= rows_per_bucket``.
    """
    import pandas as pd

    assert window <= rows_per_bucket

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch[key_col]
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "id": batch[id_col].combine_chunks().cast(pa.int64()),
                "k": pa.array(k, pa.int64()),
                "attr": batch[attr_col].combine_chunks().cast(pa.string()),
                "_kb": pa.array(k >> bucket_shift, pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch["_kb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"_kb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    counts = driver_merge_sum(
        tagged.map_batches(count_partial, batch_format="pyarrow"),
        ["_kb"],
        ["c"],
    ).sort_values("_kb")
    kbs = counts["_kb"].to_numpy(dtype=np.int64)
    offs = np.concatenate(
        ([0], np.cumsum(counts["c"].to_numpy(dtype=np.int64))[:-1])
    )
    off_ref = ray.put((kbs, offs))

    def rank_part(part: pa.Table) -> pa.Table:
        skb, soff = ray.get(off_ref)
        df = part.to_pandas().sort_values(["_kb", "k", "id"], kind="mergesort")
        kb = df["_kb"].to_numpy()
        # position within each key-bucket run
        starts = np.flatnonzero(np.r_[True, kb[1:] != kb[:-1]])
        local = np.arange(len(df)) - np.repeat(
            starts, np.diff(np.r_[starts, len(df)])
        )
        rn = soff[np.searchsorted(skb, kb)] + local
        return pa.table(
            {
                "id": pa.array(df["id"].to_numpy(np.int64), pa.int64()),
                "attr": pa.array(df["attr"], pa.string()),
                "rn": pa.array(rn, pa.int64()),
            }
        )

    ranked = _coarse_group_apply(tagged, "_kb", rank_part, num_parts)

    B = rows_per_bucket

    def to_rank_buckets(batch: pa.Table) -> pa.Table:
        rn = batch["rn"].to_numpy(zero_copy_only=False)
        g = rn // B
        native = pa.table(
            {
                "id": batch["id"],
                "attr": batch["attr"],
                "rn": batch["rn"],
                "g": pa.array(g, pa.int64()),
            }
        )
        tail = rn % B >= B - (window - 1)
        if not tail.any():
            return native
        copy = batch.filter(pa.array(tail))
        copies = pa.table(
            {
                "id": copy["id"],
                "attr": copy["attr"],
                "rn": copy["rn"],
                "g": pa.array(g[tail] + 1, pa.int64()),
            }
        )
        return pa.concat_tables([native, copies])

    bucketed = ranked.map_batches(to_rank_buckets, batch_format="pyarrow")

    def pairs_part(part: pa.Table) -> pa.Table:
        df = part.to_pandas().sort_values(["g", "rn"], kind="mergesort")
        g = df["g"].to_numpy()
        rn = df["rn"].to_numpy()
        ids = df["id"].to_numpy()
        attr = df["attr"].to_numpy()
        outs = []
        for d in range(1, window):
            if len(df) <= d:
                break
            ok = (
                (g[d:] == g[:-d])
                & (rn[d:] - rn[:-d] == d)
                & (rn[d:] // B == g[d:])  # second row native
            )
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ids[:-d][ok],
                        "id_b": ids[d:][ok],
                        "attr_a": attr[:-d][ok],
                        "attr_b": attr[d:][ok],
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "attr_a": pa.array([], pa.string()),
                    "attr_b": pa.array([], pa.string()),
                }
            )
        out = pd.concat(outs, ignore_index=True)
        return pa.table(
            {
                "id_a": pa.array(out["id_a"].to_numpy(np.int64), pa.int64()),
                "id_b": pa.array(out["id_b"].to_numpy(np.int64), pa.int64()),
                "attr_a": pa.array(out["attr_a"], pa.string()),
                "attr_b": pa.array(out["attr_b"], pa.string()),
            }
        )

    return _coarse_group_apply(bucketed, "g", pairs_part, num_parts)


# ---------------------------------------------------- paragraph dedup
def paragraph_dedup_counts(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_para: int = 8,
) -> "ray.data.Dataset":
    """CCNet-style paragraph-hash dedup (Wenzek et al. 2020): split
    every document into paragraphs, hash each, keep only the FIRST
    occurrence of every distinct paragraph corpus-wide (first = min
    (doc_id, paragraph_index)), and report per-document totals.  This
    is the dedup CCNet runs over Common Crawl WET text before language
    ID — duplicate boilerplate paragraphs vanish even when no two full
    documents are equal.

    Paragraph boundary: documents here are single-line word streams, so
    a "paragraph" is a fixed ``words_per_para`` word window (the rule
    the SQL twin replicates); on real WET text pass the natural
    ``text.split("\\n\\n")`` segmentation by pre-splitting upstream.
    Tokenization is an explicit SPACE split with empty tokens dropped —
    exactly the ``list_filter(string_split(text, ' '), ...)`` form of
    the SQL twin, so leading/trailing/double spaces can never desync
    the window ordinals between the two sides (tabs/newlines stay
    inside words on BOTH sides); an all-space document yields no
    paragraphs on either side.

    Scale shape: the one exchange carries (doc_id, pidx, hash64) rows —
    never paragraph text (CCNet likewise dedups on the digest alone);
    partitions are coarse hash ranges, keep-first inside a partition is
    a vectorized lexsort, and only per-(partition, doc) COUNT partials
    leave it, so the second groupby moves at most docs x partitions
    tiny rows.
    """

    def to_paras(batch: pa.Table) -> pa.Table:
        ids, pidxs, hashes = [], [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            words = [w for w in (t or "").split(" ") if w]
            for p in range(0, len(words), words_per_para):
                ids.append(i)
                pidxs.append(p // words_per_para)
                hashes.append(
                    _hash64(" ".join(words[p : p + words_per_para]))
                )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "pidx": pa.array(pidxs, pa.int64()),
                "phash": pa.array(hashes, pa.uint64()),
            }
        )

    def keep_first(part: pa.Table) -> pa.Table:
        import pandas as pd

        df = part.to_pandas()
        order = np.lexsort(
            (df["pidx"].to_numpy(), df[id_col].to_numpy())
        )
        # first occurrence in (doc_id, pidx) order per hash: vectorized
        # via pandas duplicated on the ordered frame
        odf = pd.DataFrame(
            {
                "phash": df["phash"].to_numpy()[order],
                id_col: df[id_col].to_numpy()[order],
            }
        )
        kept_ordered = (~odf["phash"].duplicated()).to_numpy()
        agg = (
            pd.DataFrame(
                {
                    id_col: odf[id_col],
                    "n_paras": 1,
                    "n_kept": kept_ordered.astype(np.int64),
                }
            )
            .groupby(id_col, as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    paras = ds.map_batches(to_paras, batch_format="pyarrow")
    partials = _coarse_group_apply(paras, "phash", keep_first)
    return partials.groupby(id_col).sum(["n_paras", "n_kept"])


def span_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 3,
    sep: str = ". ",
) -> "ray.data.Dataset":
    """C4's OTHER dedup (Raffel et al. 2020 §2.2): remove any
    ``span``-sentence window that occurs more than once corpus-wide,
    keeping the first occurrence (first = min (doc_id, sentence
    index)).  Unlike ``paragraph_dedup_counts`` (whole-unit dedup) a
    repeated WINDOW marks all of its sentences for removal in every
    later document, so shared runs vanish even when no single
    paragraph repeats exactly.

    Scale shape — two slim exchanges, text moves once:
    1. (span_hash64, doc_id, sidx) rows co-partition by hash; a
       vectorized keep-first per partition emits REMOVAL markers
       (doc_id, sentence index) only for non-first occurrences
       (the digest-only dedup stance of CCNet/C4 themselves).
    2. markers co-partition with the documents by ``id_col``; the
       rebuild drops marked sentences and re-joins the survivors.

    Returns (id_col, clean_text, n_sentences, n_kept, n_removed) —
    documents with fewer than ``span`` sentences pass through
    untouched.
    """
    import pandas as pd

    ds = ds.materialize()  # consumed by span scan AND rebuild

    def to_spans(batch: pa.Table) -> pa.Table:
        ids, sidxs, hashes = [], [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            sents = [s for s in (t or "").split(sep) if s]
            for k in range(len(sents) - span + 1):
                ids.append(i)
                sidxs.append(k)
                hashes.append(_hash64(sep.join(sents[k : k + span])))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "sidx": pa.array(sidxs, pa.int64()),
                "shash": pa.array(hashes, pa.uint64()),
            }
        )

    def removal_markers(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        order = np.lexsort(
            (df["sidx"].to_numpy(), df[id_col].to_numpy())
        )
        odf = pd.DataFrame(
            {
                "shash": df["shash"].to_numpy()[order],
                id_col: df[id_col].to_numpy()[order],
                "sidx": df["sidx"].to_numpy()[order],
            }
        )
        dup = odf["shash"].duplicated().to_numpy()
        d = odf[dup]
        if len(d) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "ridx": pa.array([], pa.int64()),
                }
            )
        ids = np.repeat(d[id_col].to_numpy(), span)
        ridx = (
            np.repeat(d["sidx"].to_numpy(), span)
            + np.tile(np.arange(span), len(d))
        )
        out = pd.DataFrame({id_col: ids, "ridx": ridx}).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema([(id_col, pa.int64()), ("ridx", pa.int64())])
        )

    markers = _coarse_group_apply(
        ds.map_batches(to_spans, batch_format="pyarrow"),
        "shash",
        removal_markers,
    )

    # doc-side co-partition: pad both streams to one schema
    doc_schema = ds.schema().base_schema
    doc_cols = list(doc_schema.names)
    union_cols = doc_cols + ["ridx", "_side"]

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column(
            "ridx", pa.nulls(n, type=pa.int64())
        )
        return batch.append_column(
            "_side", pa.array([0] * n, pa.int64())
        ).select(union_cols)

    def tag_markers(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for name in doc_cols:
            if name == id_col:
                cols[name] = batch[id_col]
            else:
                cols[name] = pa.nulls(
                    n, type=doc_schema.field(name).type
                )
        cols["ridx"] = batch["ridx"]
        cols["_side"] = pa.array([1] * n, pa.int64())
        return pa.table({c: cols[c] for c in union_cols})

    both = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        markers.map_batches(tag_markers, batch_format="pyarrow")
    )

    carry_cols = [c for c in doc_cols if c not in (id_col, text_col)]

    def rebuild(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        docs = df[df["_side"] == 0]
        rm = df[df["_side"] == 1]
        rm_map: dict = {}
        for i, r in zip(rm[id_col], rm["ridx"]):
            rm_map.setdefault(i, set()).add(int(r))
        out_text, n_sent, n_kept, n_rm = [], [], [], []
        for i, t in zip(docs[id_col], docs[text_col]):
            sents = [s for s in (t or "").split(sep) if s]
            bad = rm_map.get(i, ())
            kept = [s for k, s in enumerate(sents) if k not in bad]
            out_text.append(sep.join(kept))
            n_sent.append(len(sents))
            n_kept.append(len(kept))
            n_rm.append(len(sents) - len(kept))
        cols = {
            id_col: pa.Array.from_pandas(
                docs[id_col], type=pa.int64()
            )
        }
        for c in carry_cols:  # lang etc. ride through the rebuild
            cols[c] = pa.Array.from_pandas(
                docs[c], type=doc_schema.field(c).type
            )
        cols["clean_text"] = pa.array(out_text, pa.string())
        cols["n_sentences"] = pa.array(n_sent, pa.int64())
        cols["n_kept"] = pa.array(n_kept, pa.int64())
        cols["n_removed"] = pa.array(n_rm, pa.int64())
        return pa.table(cols)

    return _coarse_group_apply(both, id_col, rebuild)
