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


@ray.remote(num_cpus=0)
class SeenShard:
    # merge the pending buffer into the sorted base above this size:
    # np.isin re-sorts pending per probe, so keep it bounded
    _MERGE_AT = 1 << 16

    def __init__(self, mode: str = "exact", bloom_bits: int = 1 << 22):
        self.mode = mode
        self.bloom = _Bloom(bloom_bits)
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

    def size(self) -> int:
        return self.count

    def snapshot(self) -> dict:
        out = {"mode": self.mode, "count": self.count, "bloom": self.bloom.bits}
        if self.mode == "exact":
            out["exact"] = np.concatenate([self._sorted, self._pending])
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


class SeenFilterPool:
    """Client facade over the shard actors (picklable: holds handles only)."""

    def __init__(self, num_shards: int = 8, mode: str = "exact", bloom_bits: int = 1 << 22):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(mode=mode, bloom_bits=bloom_bits)
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

    def total(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list) -> None:
        assert len(snaps) == self.num_shards
        ray.get(
            [s.restore.remote(snap) for s, snap in zip(self.shards, snaps)]
        )
