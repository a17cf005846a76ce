"""Mergeable sketches: HyperLogLog distinct counting.

The reference has no approximate sketches (SURVEY.md §2.6 "absent");
at 10^10-URL scale exact distinct counts (urls seen, hosts touched,
unique tokens) are shuffle-heavy, while an HLL is one `map_batches`
pass producing a few-KB partial per block, merged associatively —
no shuffle at all.

Flajolet et al. 2007 HLL with the standard bias correction; register
hashing reuses the engine's 64-bit content hashes, so estimates are
deterministic across runs and partitionings (merge is a register-wise
max — order-independent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = position of the first 1-bit in the remaining 64-p bits
        # (1-based), vectorized leading-zero count via bit shifts
        rank = np.zeros(len(h), dtype=np.uint8)
        rem = (h << np.uint64(self.p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        for r in range(1, 64 - self.p + 1):
            top = (rem >> np.uint64(63)) & np.uint64(1)
            rank[(rank == 0) & (top == 1)] = r
            rem = (rem << np.uint64(1)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            if not (rank == 0).any():
                break
        rank[rank == 0] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        z = 1.0 / np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m * z
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        return e


def approx_distinct(
    ds, col: str, p: int = 12, hash_fn=None
) -> float:
    """Approximate distinct count of a column: per-batch partial HLLs
    (a few KB each), associative register-max merge on the driver."""
    import hashlib

    def default_hash(values) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        str(v).encode("utf-8"), digest_size=8
                    ).digest(),
                    "big",
                )
                for v in values
            ),
            dtype=np.uint64,
            count=len(values),
        )

    hf = hash_fn or default_hash

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_hashes(hf(batch[col].to_pylist()))
        return pa.table(
            {"registers": pa.array([hll.registers.tobytes()], pa.binary())}
        )

    merged = HyperLogLog(p)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        other = HyperLogLog(p)
        other.registers = np.frombuffer(
            row["registers"], dtype=np.uint8
        ).copy()
        merged = merged.merge(other)
    return merged.estimate()
