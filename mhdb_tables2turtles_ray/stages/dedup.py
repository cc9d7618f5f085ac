"""Global exact triple-set deduplication (the reference's statements-dict
set semantics, reference ``mhdb/ingest.py:28-76``, distributed).

Two-phase partial/final aggregate:

1. **Partial** (no shuffle): per-batch Arrow ``group_by`` distinct — the
   emitter already de-dups within a batch, this collapses across
   concatenated batches too — then a vectorized uint64 hash of
   ``(s,p,o)`` bucketed to ``num_buckets``.
2. **Final** (the one shuffle): ``groupby("bucket")`` on a single int
   key, per-group Arrow distinct.

Skew: bucketing on the hash of the FULL triple is uniform by
construction — a high-degree subject (e.g. the ':None' hot object, a hot
repo) spreads across all buckets, so no explicit salting is needed for
*dedup* (it IS needed for subject-grouped stages; see materialize.py,
which groups by subject-hash partitions and relies on subjects' triple
fan-in being bounded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _distinct(t: pa.Table) -> pa.Table:
    return t.group_by(["subj", "pred", "obj"]).aggregate([])


def triple_hash(t: pa.Table) -> np.ndarray:
    """Vectorized uint64 hash of (subj, pred, obj)."""
    joined = pc.binary_join_element_wise(
        t.column("subj"), t.column("pred"), t.column("obj"), "\x1f"
    )
    return pd.util.hash_array(np.asarray(joined.to_pylist(), dtype=object))


def dedup_triples(triples, num_buckets: int = 64):
    """Exact global dedup of a (subj, pred, obj) Dataset.

    ``num_buckets`` bounds the size of each final-phase group — at 100 TB
    raise it so bucket size ≈ target block size; at test scale 64 is
    plenty.
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = _distinct(batch.select(["subj", "pred", "obj"]))
        bucket = (triple_hash(batch) % num_buckets).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        return _distinct(group.select(["subj", "pred", "obj"]))

    return (
        triples.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
    )
