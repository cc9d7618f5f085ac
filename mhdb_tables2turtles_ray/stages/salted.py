"""Salted two-phase grouped aggregation for skewed keys.

The north rule mandates explicit salting for high-degree entities: a
bare ``groupby(key)`` sends EVERY row of a hot key to one reducer. The
classic fix, implemented here for counts (the shape generalizes to any
commutative monoid):

    phase 0 (no shuffle): per-batch combine — pyarrow group_by inside
             map_batches emits one row per key per batch;
    phase 1: groupby((key, salt)) partial sums — a hot key's rows are
             spread over ``num_salts`` reducers;
    phase 2: groupby(key) over ≤ num_salts rows per key — trivially small.

For *count* the per-batch combine already bounds phase-1 input to
(#batches × #keys-per-batch) rows, so salting matters when the DISTINCT
key count itself is small but hot (exactly the high-degree-subject
case). Salt derives from a deterministic hash of the partial-count row
position — any spreading function works because counts are additive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum


def salted_group_count(
    ds,
    key_col: str,
    num_salts: int = 8,
    out_col: str = "degree",
):
    """(key, count) with the hot-key-safe two-phase shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        counts = batch.select([key_col]).group_by([key_col]).aggregate(
            [(key_col, "count")]
        )
        salt = pd.util.hash_array(
            np.asarray(counts.column(key_col).to_pylist(), dtype=object)
        )
        # spread partials of the SAME key across salts per-batch: add the
        # batch-local row index so two batches of one hot key land on
        # different reducers
        salt = (salt + np.arange(len(salt), dtype=np.uint64)) % num_salts
        return pa.table(
            {
                key_col: counts.column(key_col),
                "partial_count": pa.array(
                    counts.column(f"{key_col}_count").to_pylist(), pa.int64()
                ),
                "salt": pa.array(salt.astype(np.int64), pa.int64()),
            }
        )

    phase1 = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "salt"])
        .aggregate(Sum("partial_count", alias_name="salted_count"))
    )
    final = phase1.groupby(key_col).aggregate(
        Sum("salted_count", alias_name=out_col)
    )

    def cast(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.column_names.index(out_col),
            out_col,
            pc.cast(batch.column(out_col), pa.int64()),
        )

    return final.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)
