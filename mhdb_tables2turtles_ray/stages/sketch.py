"""Mergeable sketches: HyperLogLog approximate distinct count.

The at-scale aggregation idiom (guide: "emit one serialized sketch per
batch and merge them in a second, tiny stage"): each ``map_batches``
task builds a dense HLL over its batch and emits ONE row carrying the
register array; the driver (or a tiny reduce) merges by elementwise
max. The shuffle moves ``#batches × 2^p`` bytes instead of the data.

Standard HLL (Flajolet et al. 2007) with the small-range linear
counting correction; deterministic 64-bit hashing (pandas' vectorized
siphash with its fixed default key — the same stable-hash trick as
``pipelines/dedup.py:_stable_hash64``, ~20× faster than a per-value
blake2b loop) so results are stable across runs and parallelism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash64(values) -> np.ndarray:
    arr = np.asarray(values)
    if arr.dtype.kind not in ("i", "u", "f", "b"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr).astype(np.uint64)


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add(self, values) -> None:
        h = _hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, +1. Highest set
        # bit via float log2 is unsafe at 64 bits; binary-search shifts
        # (6 vectorized passes) are exact.
        rank = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        x = rest[nz]
        bl = np.zeros(x.shape, dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            big = x >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            x[big] >>= np.uint64(shift)
        bl += x > 0  # bit_length of each nonzero lane
        rank[nz] = np.minimum((64 - bl + 1).astype(np.uint8), 64 - self.p + 1)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting correction
        return float(est)


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate distinct count of ``column`` via per-batch HLL
    sketches merged on the driver (one tiny row per batch)."""
    def sketch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        col = batch.column(column)
        hll.add(col.drop_null().to_numpy(zero_copy_only=False))
        return pa.table({"registers": pa.array([hll.registers.tobytes()], pa.binary())})

    # stream the register merge (one partial resident at a time; a
    # take_all would resident #batches × 2^p bytes — same class of
    # driver blowup as the Bloom merge fixed in stages/semijoin.py)
    merged = HyperLogLog(p)
    parts = ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for regs in b.column("registers").to_pylist():
            np.maximum(
                merged.registers,
                np.frombuffer(regs, dtype=np.uint8),
                out=merged.registers,
            )
    return merged.estimate()


def mg_compress(keys: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra-Gries decrement: compress a counter set to ≤ ``capacity``
    entries by subtracting the (capacity+1)-th largest count from every
    counter and dropping the non-positive. Each surviving estimate
    undercounts its true frequency by at most the total amount ever
    subtracted, which over any merge sequence is bounded by
    N/(capacity+1) — so any key with true count above that bound can
    never be evicted. Mergeable: summing two summaries and compressing
    again preserves the bound (Agarwal et al., "Mergeable Summaries",
    PODS 2012)."""
    if len(keys) <= capacity:
        return keys, counts
    t = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1
    ]
    keep = counts > t
    return keys[keep], counts[keep] - t
