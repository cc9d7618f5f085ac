"""Semi / anti joins as broadcast key-set filters.

The small side's key set is broadcast once (``ray.put``) and each batch
filters vectorized with numpy membership — no shuffle. For key sets too
large to broadcast exactly, :class:`BloomFilter` gives a fixed-size
approximate membership structure (semi join keeps false positives /
anti join loses them at the configured fpp — the classic trade; the
exact variant is the default and what the SQL oracle checks)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class BloomFilter:
    """Deterministic Bloom filter over int64 keys (double hashing)."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        n_bits = int(-capacity * np.log(fpp) / (np.log(2) ** 2)) + 1
        self.n_bits = max(64, n_bits)
        self.k = max(1, int(round((self.n_bits / max(1, capacity)) * np.log(2))))
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    def _hashes(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        h1 = k * np.uint64(0x9E3779B97F4A7C15)
        h2 = (k ^ (k >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
        idx = np.empty((self.k, len(keys)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
        return idx

    def add(self, keys: np.ndarray) -> None:
        for row in self._hashes(np.asarray(keys)):
            np.bitwise_or.at(
                self.bits, (row >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (row & np.uint64(63)),
            )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        out = np.ones(len(keys), dtype=bool)
        for row in self._hashes(np.asarray(keys)):
            word = self.bits[(row >> np.uint64(6)).astype(np.int64)]
            out &= (word >> (row & np.uint64(63))) & np.uint64(1) != 0
        return out


def semi_join(ds, column: str, keys_ref, anti: bool = False):
    """Keep rows whose ``column`` is (semi) / is not (anti) in the
    broadcast key set. ``keys_ref``: ``ray.put`` of a frozenset/ndarray
    of keys, or of a :class:`BloomFilter` for the approximate scale path."""
    import ray

    def filt(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        vals = batch.column(column).to_numpy()
        if isinstance(keys, BloomFilter):
            mask = keys.contains(vals)
        else:
            arr = keys if isinstance(keys, np.ndarray) else np.fromiter(
                keys, dtype=np.int64
            )
            mask = np.isin(vals, arr)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
