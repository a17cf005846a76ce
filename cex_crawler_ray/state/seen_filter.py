"""Sharded URL-seen filter: the engine's replacement for the reference's
filesystem dedup (``os.path.exists`` per announcement, reference
``exchange/binance.py:253-255`` and 12 clones — SURVEY.md §2.3 M9).

Design for 10^10 urls:

* N shard actors; a url routes to shard ``url_hash % N``.  Hot hosts
  (binance/okx-style skew) spread across shards because the key is the
  *url* hash, not the host hash.
* each shard holds a Bloom filter (numpy bit array, k hashes derived
  from the 64-bit url hash — no per-probe rehash) and, in ``exact``
  mode, a Python set as ground truth.  ``exact`` is the conformance
  mode (zero false positives — required to match the reference's seen
  set); ``bloom`` is the memory-bounded scale mode
  (10^10 keys @ 10 bits/key ≈ 12.5 GB across the whole pool, i.e.
  ~50 MB/shard at 256 shards).
* ``check_and_add`` is atomic per shard (actor serialization), so
  concurrent fetch tasks can't double-admit a url; inserts are
  idempotent (set semantics), which makes Ray task re-execution safe.
* snapshot/restore round-trips the exact sets (and bloom bits) through
  numpy arrays for the checkpoint manifest (state/checkpoint.py).

Callers interact through ``SeenFilterPool`` whose handle is cheap to
capture in ``map_batches`` closures — tasks batch their probes per
shard, so actor traffic is O(batches), not O(urls).
"""

from __future__ import annotations

import numpy as np

import ray

_BLOOM_K = 7


class _Bloom:
    def __init__(self, num_bits: int):
        self.num_bits = int(num_bits)
        self.bits = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        # k probe positions per key, derived from the 64-bit hash by
        # double hashing: h1 + i*h2 (Kirsch-Mitzenmacher).
        h1 = hashes
        h2 = (hashes >> np.uint64(32)) | np.uint64(1)
        i = np.arange(_BLOOM_K, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        word = pos >> np.uint64(6)
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=0)

    def add(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes)
        word = (pos >> np.uint64(6)).ravel()
        bit = (np.uint64(1) << (pos & np.uint64(63))).ravel()
        np.bitwise_or.at(self.bits, word, bit)


class _Cuckoo:
    """Cuckoo filter (Fan et al. 2014): 4-slot buckets of 16-bit
    fingerprints; two candidate buckets per key via the partial-key
    XOR trick (bucket count is a power of 2 so ``i2 = i1 ^ h(f)`` is
    an involution).  Unlike Bloom, supports DELETE — the seen filter
    can un-mark a url for a forced recrawl without rebuilding.

    Batch inserts are vectorized in two passes (rank-within-bucket
    scatter into i1's free slots, then i2's); only the residue that
    finds both buckets full takes the per-item kick loop, which is
    rare below ~0.9 load factor.  ``contains``/``delete`` are fully
    vectorized.  ~2 bytes/key at 4 slots: 10^10 urls ≈ 20 GB pool-wide
    (vs 12.5 GB Bloom @ 10 bits) with deletion and ~0.01% fpp.
    """

    _SLOTS = 4
    _MAX_KICKS = 500

    def __init__(self, num_buckets: int):
        nb = 1
        while nb < num_buckets:
            nb <<= 1
        self.num_buckets = nb
        self.table = np.zeros((nb, self._SLOTS), dtype=np.uint16)
        self.count = 0

    def _fp(self, hashes: np.ndarray) -> np.ndarray:
        # 1..65535 (0 is the empty-slot sentinel)
        return ((hashes >> np.uint64(48)) % np.uint64(65535)).astype(
            np.uint16
        ) + np.uint16(1)

    def _alt(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key hash of the fingerprint (odd multiplier mix)
        fh = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return (bucket ^ fh) & np.uint64(self.num_buckets - 1)

    def _candidates(self, hashes: np.ndarray):
        fp = self._fp(hashes)
        i1 = hashes & np.uint64(self.num_buckets - 1)
        return fp, i1, self._alt(i1, fp)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._candidates(hashes)
        f = fp[:, None]
        return ((self.table[i1] == f) | (self.table[i2] == f)).any(axis=1)

    def _bulk_place(
        self, buckets: np.ndarray, fp: np.ndarray
    ) -> np.ndarray:
        """Vectorized scatter of fp[j] into a free slot of buckets[j];
        returns the mask of items that fit.  Items sharing a bucket
        get distinct ranks, so every written (bucket, slot) is unique."""
        if len(buckets) == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(buckets, kind="stable")
        b_sorted = buckets[order]
        # rank of each item within its bucket run
        first = np.concatenate([[True], b_sorted[1:] != b_sorted[:-1]])
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(b_sorted)), 0)
        )
        rank = np.arange(len(b_sorted)) - run_start
        occ = (self.table[b_sorted] != 0).sum(axis=1)
        slot = occ + rank
        ok = slot < self._SLOTS
        self.table[b_sorted[ok], slot[ok]] = fp[order][ok]
        placed = np.zeros(len(buckets), dtype=bool)
        placed[order[ok]] = True
        return placed

    def add(self, hashes: np.ndarray) -> np.ndarray:
        """Insert all (assumed not-contained) keys; returns the mask of
        keys actually inserted.  A False entry means the kick loop
        overflowed (filter effectively full) — callers must NOT treat
        that key as recorded, or it will be re-admitted later."""
        fp, i1, i2 = self._candidates(hashes)
        placed = self._bulk_place(i1, fp)
        rem = ~placed
        if rem.any():
            placed2 = np.zeros(len(hashes), dtype=bool)
            placed2[rem] = self._bulk_place(i2[rem], fp[rem])
            rem &= ~placed2
        inserted = ~rem
        for j in np.nonzero(rem)[0]:
            if self._kick_insert(int(i1[j]), fp[j]):
                inserted[j] = True
        self.count += int(inserted.sum())
        return inserted

    def _kick_insert(self, bucket: int, f: np.uint16) -> bool:
        rng = np.random.default_rng(int(f) * 2654435761 % (1 << 32))
        for _ in range(self._MAX_KICKS):
            row = self.table[bucket]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                self.table[bucket, empty[0]] = f
                return True
            victim = int(rng.integers(self._SLOTS))
            f, self.table[bucket, victim] = self.table[bucket, victim], f
            bucket = int(
                self._alt(
                    np.array([bucket], np.uint64),
                    np.array([f], np.uint16),
                )[0]
            )
        return False

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE matching fingerprint per key; vectorized via
        first-match scatter on unique (bucket, slot) targets.  Returns
        the mask of keys actually removed."""
        fp, i1, i2 = self._candidates(hashes)
        removed = np.zeros(len(hashes), dtype=bool)
        for cand in (i1, i2):
            todo = np.nonzero(~removed)[0]
            if not len(todo):
                break
            rows = self.table[cand[todo]]
            hit = rows == fp[todo][:, None]
            has = hit.any(axis=1)
            slot = hit.argmax(axis=1)
            # duplicate (bucket, slot) targets within the batch would
            # double-delete one physical slot; keep first occurrence.
            # No-hit rows get unique sentinel keys so their garbage
            # (bucket, argmax=0) value can't shadow a genuine hit.
            key = cand[todo] * np.uint64(self._SLOTS) + slot.astype(
                np.uint64
            )
            key = np.where(
                has,
                key,
                np.uint64(2**63) + np.arange(len(todo), dtype=np.uint64),
            )
            _, first_idx = np.unique(key, return_index=True)
            keep = np.zeros(len(todo), dtype=bool)
            keep[first_idx] = True
            sel = has & keep
            hit_buckets = cand[todo][sel]
            self.table[hit_buckets, slot[sel]] = 0
            # re-compact the touched rows: ``_bulk_place`` writes at
            # slot ``occupancy + rank`` assuming filled slots are
            # contiguous from 0 — a mid-row hole would let a later
            # bulk insert overwrite a live fingerprint
            ub = np.unique(hit_buckets)
            if len(ub):
                rows = self.table[ub]
                order = np.argsort(rows == 0, axis=1, kind="stable")
                self.table[ub] = np.take_along_axis(rows, order, axis=1)
            removed[todo[sel]] = True
        self.count -= int(removed.sum())
        return removed


@ray.remote(num_cpus=0)
class SeenShard:
    # merge the pending buffer into the sorted base above this size:
    # np.isin re-sorts pending per probe, so keep it bounded
    _MERGE_AT = 1 << 16

    def __init__(
        self,
        mode: str = "exact",
        bloom_bits: int = 1 << 22,
        cuckoo_buckets: int = 1 << 18,
    ):
        self.mode = mode
        self.bloom = _Bloom(bloom_bits)
        self.cuckoo = (
            _Cuckoo(cuckoo_buckets) if mode == "cuckoo" else None
        )
        # exact mode: sorted base array + small unsorted pending buffer
        # (vectorized membership — a Python set pays a per-url loop that
        # serializes the whole pool at high core counts; measured: the
        # shard kernel, not the RPC fan-out, bounded admission scaling)
        self._sorted = np.empty(0, dtype=np.uint64)
        self._pending = np.empty(0, dtype=np.uint64)
        self.count = 0

    def _exact_contains(self, uniq: np.ndarray) -> np.ndarray:
        out = np.zeros(len(uniq), dtype=bool)
        if len(self._sorted):
            pos = np.searchsorted(self._sorted, uniq)
            pos[pos >= len(self._sorted)] = 0
            out |= self._sorted[pos] == uniq
        if len(self._pending):
            out |= np.isin(uniq, self._pending)
        return out

    def _exact_insert(self, new_keys: np.ndarray) -> None:
        self._pending = np.concatenate([self._pending, new_keys])
        if len(self._pending) > self._MERGE_AT:
            merged = np.concatenate([self._sorted, self._pending])
            merged.sort()
            self._sorted = merged
            self._pending = np.empty(0, dtype=np.uint64)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Returns a boolean mask: True where the hash was NEW (admitted).

        Duplicates *within* the batch are admitted once (first wins)."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if self.mode == "exact":
            # np.unique's return_index is the FIRST occurrence, so
            # within-batch duplicates keep first-wins semantics
            uniq, first_idx = np.unique(hashes, return_index=True)
            new_uniq = ~self._exact_contains(uniq)
            self._exact_insert(uniq[new_uniq])
            new = np.zeros(len(hashes), dtype=bool)
            new[first_idx[new_uniq]] = True
            self.bloom.add(hashes[new])
        elif self.mode == "cuckoo":
            maybe_seen = self.cuckoo.contains(hashes)
            _, first_idx = np.unique(hashes, return_index=True)
            first = np.zeros(len(hashes), dtype=bool)
            first[first_idx] = True
            new = (~maybe_seen) & first
            # kick-loop overflow (filter full) must demote the key to
            # not-new: an unrecorded key reported new would be admitted
            # again on a later batch and the count would drift from the
            # filter contents (and restore() would persist the drift)
            inserted = self.cuckoo.add(hashes[new])
            if not inserted.all():
                idx = np.nonzero(new)[0]
                new[idx[~inserted]] = False
        else:
            maybe_seen = self.bloom.contains(hashes)
            # in-batch first-wins on top of the filter
            _, first_idx = np.unique(hashes, return_index=True)
            first = np.zeros(len(hashes), dtype=bool)
            first[first_idx] = True
            new = (~maybe_seen) & first
            self.bloom.add(hashes[new])
        self.count += int(new.sum())
        return new

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Un-mark urls (forced recrawl).  Supported in ``cuckoo`` mode
        (per-fingerprint removal) and ``exact`` mode (set removal);
        Bloom cannot delete — callers must rebuild, which is exactly
        the limitation the cuckoo mode removes."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if self.mode == "cuckoo":
            removed = self.cuckoo.delete(hashes)
            self.count -= int(removed.sum())
            return removed
        if self.mode == "exact":
            uniq = np.unique(hashes)
            present = self._exact_contains(uniq)
            drop = uniq[present]
            if len(drop):
                self._sorted = self._sorted[
                    ~np.isin(self._sorted, drop)
                ]
                self._pending = self._pending[
                    ~np.isin(self._pending, drop)
                ]
                self.count -= int(len(drop))
            out = np.isin(hashes, drop)
            # only the FIRST occurrence of a duplicate counts as removed
            _, first_idx = np.unique(hashes, return_index=True)
            first = np.zeros(len(hashes), dtype=bool)
            first[first_idx] = True
            return out & first
        raise ValueError("bloom mode cannot delete; rebuild the filter")

    def size(self) -> int:
        return self.count

    def snapshot(self) -> dict:
        out = {"mode": self.mode, "count": self.count, "bloom": self.bloom.bits}
        if self.mode == "exact":
            out["exact"] = np.concatenate([self._sorted, self._pending])
        if self.mode == "cuckoo":
            out["cuckoo"] = self.cuckoo.table
        return out

    def restore(self, snap: dict) -> None:
        self.mode = snap["mode"]
        self.count = int(snap["count"])
        self.bloom.bits = np.asarray(snap["bloom"], dtype=np.uint64).copy()
        if self.mode == "exact":
            base = np.asarray(snap["exact"], dtype=np.uint64).copy()
            base.sort()
            self._sorted = base
            self._pending = np.empty(0, dtype=np.uint64)
        if self.mode == "cuckoo":
            table = np.asarray(snap["cuckoo"], dtype=np.uint16).copy()
            self.cuckoo = _Cuckoo(table.shape[0])
            self.cuckoo.table = table
            self.cuckoo.count = int(snap["count"])


class SeenFilterPool:
    """Client facade over the shard actors (picklable: holds handles only)."""

    def __init__(
        self,
        num_shards: int = 8,
        mode: str = "exact",
        bloom_bits: int = 1 << 22,
        cuckoo_buckets: int = 1 << 18,
    ):
        self.num_shards = num_shards
        # SPREAD placement: zero-resource actors default to the
        # caller's node, which on a multi-node cluster piles every
        # shard onto the head raylet — all admission RPCs from the
        # other raylets then serialize through one node (measured:
        # 0.624 admission node-scaling at 1→4 raylets).  Spreading
        # the shards balances RPC service across nodes so aggregate
        # admission bandwidth scales with the cluster; on a single
        # node SPREAD is a no-op.
        self.shards = [
            SeenShard.options(scheduling_strategy="SPREAD").remote(
                mode=mode,
                bloom_bits=bloom_bits,
                cuckoo_buckets=cuckoo_buckets,
            )
            for _ in range(num_shards)
        ]

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Batched cross-shard probe; preserves input order."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        shard_of = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        result = np.zeros(len(hashes), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                refs.append(self.shards[s].check_and_add.remote(hashes[idx]))
                idxs.append(idx)
        for idx, mask in zip(idxs, ray.get(refs)):
            result[idx] = mask
        return result

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Un-mark urls across shards (forced recrawl); order-preserving."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        shard_of = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        result = np.zeros(len(hashes), dtype=bool)
        refs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                refs.append(self.shards[s].delete.remote(hashes[idx]))
                idxs.append(idx)
        for idx, mask in zip(idxs, ray.get(refs)):
            result[idx] = mask
        return result

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list) -> None:
        assert len(snaps) == self.num_shards
        ray.get(
            [s.restore.remote(snap) for s, snap in zip(self.shards, snaps)]
        )
