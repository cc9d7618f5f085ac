"""Semi / anti joins as broadcast key-set filters.

The small side's key set is broadcast once (``ray.put``) and each batch
filters vectorized with numpy membership — no shuffle.
:func:`build_key_filter` picks the representation by measured size:
exact ndarray below the threshold, :class:`BloomFilter` above it — so
the scale-safe path is the DEFAULT, not an option. The Bloom build is
itself distributed (per-batch partial filters OR-merged on the driver;
fixed-size rows, keys never collect). Semi join keeps Bloom false
positives / anti join would lose them at the configured fpp — the
classic trade — so anti joins must pass ``exact=True`` (or accept the
approximation explicitly)."""

from __future__ import annotations

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


def _streamed_bloom(keys_ds, column: str, n: int, fpp: float, key_fn):
    """Distributed Bloom build shared by the int64 and string filters:
    per-batch partial filters, STREAMED OR-merge (iter_batches, not
    take_all — partial filters arrive under backpressure and the driver
    holds ~one at a time; take_all would resident #batches × filter_size
    at once, which at a 1M-key index already cost >1 GB of driver heap,
    measured). Large batch_size keeps the partial count (and total wire
    bytes) low. ``key_fn`` maps the raw column ndarray to uint64 keys."""

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity=n, fpp=fpp)
        bf.add(key_fn(batch.column(column).to_numpy(zero_copy_only=False)))
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    merged = BloomFilter(capacity=n, fpp=fpp)
    parts = keys_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    for b in parts.iter_batches(batch_size=1, batch_format="pyarrow"):
        for bits in b.column("bits").to_pylist():
            merged.bits |= np.frombuffer(bits, dtype=np.uint64)
    return merged


def build_key_filter(
    keys_ds,
    column: str,
    exact_threshold: int = 4_000_000,
    fpp: float = 1e-4,
):
    """Distributed small-side build for :func:`semi_join`.

    ``keys_ds``: Dataset of (possibly duplicated) join keys. Counts the
    rows first (one cheap metadata-ish pass); at or under
    ``exact_threshold`` collects the distinct int64 keys into an exact
    ndarray, above it builds a :class:`BloomFilter` via
    :func:`_streamed_bloom`. Pass ``exact_threshold=None`` to force the
    exact path (anti joins).
    """
    n = keys_ds.count()
    if n == 0:
        # Dataset.unique() returns None (not an empty list) on an empty
        # dataset — an empty exact key set is the correct filter here
        return np.empty(0, dtype=np.int64)
    if exact_threshold is None or n <= exact_threshold:
        return np.unique(
            np.fromiter(keys_ds.unique(column), dtype=np.int64, count=-1)
        )
    return _streamed_bloom(keys_ds, column, n, fpp, lambda v: v)


def hash_strings(vals: np.ndarray) -> np.ndarray:
    """Deterministic vectorized uint64 hash of a string array (pandas
    siphash with the library's fixed default key — stable across
    processes, so a filter built in one task probes correctly in
    another)."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(vals, dtype=object))


def build_string_key_filter(
    keys_ds,
    column: str,
    exact_threshold: int = 4_000_000,
    fpp: float = 1e-4,
):
    """:func:`build_key_filter`'s string-key sibling (n-grams, digests,
    URLs). At or under ``exact_threshold`` DISTINCT keys: an exact
    object ndarray (hash-based ``pd.Series.isin`` probe — zero false
    positives, the oracle-checkable representation; object dtype, never
    fixed-width unicode, so one long key can't inflate the whole
    array). Above it: a :class:`BloomFilter` over :func:`hash_strings`
    of the keys, via the shared :func:`_streamed_bloom` — the probe
    side must hash with :func:`hash_strings` too (semi-join-only, per
    the Bloom false-positive trade)."""
    import pandas as pd

    n = keys_ds.count()
    if n == 0:
        return np.empty(0, dtype=object)
    if exact_threshold is None or n <= exact_threshold:
        vals = keys_ds.unique(column) or ()
        return pd.unique(np.asarray(list(vals), dtype=object))
    return _streamed_bloom(keys_ds, column, n, fpp, hash_strings)


def string_filter_contains(keys, vals: np.ndarray) -> np.ndarray:
    """Membership probe against a :func:`build_string_key_filter` result
    (exact ndarray or BloomFilter), vectorized (hash-based — object
    string arrays make np.isin fall into its slow sort path)."""
    import pandas as pd

    if isinstance(keys, BloomFilter):
        return keys.contains(hash_strings(vals))
    return pd.Series(vals, dtype=object).isin(keys).to_numpy()


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
