"""Coarse-bucketed grouped map: the at-scale ``groupby(key).map_groups``.

``Dataset.groupby(k).map_groups(fn)`` schedules one task per fine group;
with millions of tiny groups (per-user, per-subject) per-group task
overhead dominates the actual work. The fix — proven on the LSH dedup
ops (``pipelines/dedup.py``) and promoted here to a shared stage — is to
shuffle on a coarse hash bucket of the key (``num_buckets`` Ray groups)
and run the fine-key pandas groupby INSIDE each bucket task, amortizing
task overhead by ~|keys| / num_buckets.

Correctness relies only on the bucket hash being a pure function of the
key: every row of a fine key lands in the same bucket, so ``fn`` always
sees whole groups. The hash (pandas' vectorized siphash with its fixed
default key) is deterministic across processes and runs.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

_BUCKET = "__coarse_bucket"


def grouped_map(
    ds,
    key: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 256,
):
    """``groupby(key).map_groups(fn)`` with a coarse-bucket shuffle.

    ``fn`` receives one whole fine group (a pandas DataFrame, ``key``
    column included) and returns a DataFrame; outputs are concatenated
    per bucket. Group size must fit a worker (same contract as
    ``map_groups``); the bucket must fit too — with uniform keys a
    bucket holds ~|rows| / num_buckets rows, so raise ``num_buckets``
    for bigger datasets (it only changes task granularity, never
    results).

    Rows with a NULL key are DROPPED (pandas ``groupby`` semantics) —
    every current caller keys on a non-nullable column; filter or
    fill nulls upstream if a nullable key ever needs grouping.
    """

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df[_BUCKET] = (
            pd.util.hash_array(df[key].to_numpy()) % np.uint64(num_buckets)
        ).astype(np.int64)
        return df

    def run_bucket(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=[_BUCKET])
        outs = [fn(g) for _, g in part.groupby(key, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(run_bucket, batch_format="pandas")
    )
