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


def _with_bucket(df: pd.DataFrame, key: str, num_buckets: int) -> pd.DataFrame:
    """Attach the coarse bucket column. ONE home for the bucket-hash
    rule: every stage in this module relies on the hash being the same
    pure function of ``key`` everywhere, so it must not be re-stated
    per stage (a drift in one copy would silently split fine groups
    across buckets for that stage only)."""
    df = df.copy(deep=False)
    df[_BUCKET] = (
        pd.util.hash_array(df[key].to_numpy()) % np.uint64(num_buckets)
    ).astype(np.int64)
    return df


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
        return _with_bucket(df, key, num_buckets)

    def run_bucket(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=[_BUCKET])
        outs = [fn(g) for _, g in part.groupby(key, sort=False)]
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(run_bucket, batch_format="pandas")
    )


def sorted_bucket_map(
    ds,
    key: str,
    sort_cols: list[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 256,
):
    """:func:`grouped_map`'s bucket-wide sibling for per-group logic
    that VECTORIZES ACROSS GROUPS (as-of forward fill, session boundary
    detection): ``bucket_fn`` receives the ENTIRE bucket sorted by
    ``[key, *sort_cols]`` (stable) and computes every group's answer in
    whole-column operations — group boundaries are just
    ``key != key.shift()`` rows.

    Versus :func:`grouped_map`'s ``[fn(g) for g in groupby]`` loop this
    removes the per-fine-group Python/pandas object overhead (~100 µs ×
    |keys| per bucket), which dominates when groups are tiny (per-user
    event logs). Same correctness contract: the coarse hash is a pure
    function of ``key``, so a bucket holds only whole groups, and the
    stable sort gives ``bucket_fn`` a deterministic row order."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df, key, num_buckets)

    def run_bucket(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=[_BUCKET])
        part = part.sort_values(
            [key, *sort_cols], kind="mergesort"
        ).reset_index(drop=True)
        return bucket_fn(part)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(run_bucket, batch_format="pandas")
    )


def bucket_map(
    ds,
    key: str,
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 256,
):
    """:func:`sorted_bucket_map` without the sort: ``bucket_fn``
    receives the ENTIRE bucket (row order unspecified) for per-group
    logic that needs whole groups but no in-group ordering — e.g. a
    per-key EXISTS flag computed as one ``isin`` against the key set
    that satisfies the predicate (``stages/provenance.py``). Same
    correctness contract (coarse hash is a pure function of ``key``, so
    a bucket holds only whole groups) at the cost of one shuffle and
    zero sorts."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _with_bucket(df, key, num_buckets)

    def run_bucket(part: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(part.drop(columns=[_BUCKET]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(run_bucket, batch_format="pandas")
    )


def bucketed_agg(
    ds,
    key: str,
    value: str,
    how: str = "sum",
    out: str | None = None,
    num_buckets: int = 256,
):
    """``groupby(key).agg(how)`` (sum/min/max) as a coarse-bucket
    shuffle — the scalar-aggregation sibling of :func:`grouped_map`.

    ``Dataset.groupby(key).sum/aggregate`` runs a distributed SORT on
    the fine key; with tens of millions of distinct keys the sort is
    the whole cost (measured 7x slower than this shape at 11M rows —
    see ``pipelines/dedup.py:_dup_window_filter``). Here each batch
    pre-aggregates locally (sum/min/max are decomposable, so the
    shuffle carries at most |distinct keys in batch| rows), the
    shuffle sorts only ``num_buckets`` distinct bucket values, and one
    vectorized pandas groupby per bucket task finishes the reduction.

    Returns a Dataset with columns ``[key, out or value]``. NULL keys
    are dropped (pandas groupby semantics, same contract as
    :func:`grouped_map`); aggregate dtype follows pandas (int64 stays
    int64 for min/max/sum, float64 stays float64). ``value`` may equal
    ``key`` — min/max of a key over itself is the key, so with a
    distinct ``out`` name this is the distinct-keys reduction (pinned
    by test)."""
    if how not in ("sum", "min", "max"):
        raise ValueError(f"how must be sum/min/max, got {how!r}")
    out = out or value

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[value].agg(how)
        keys = g.index.to_numpy()
        return pd.DataFrame(
            {
                key: keys,
                value: g.to_numpy(),
                _BUCKET: (
                    pd.util.hash_array(keys) % np.uint64(num_buckets)
                ).astype(np.int64),
            }
        )

    def final(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(key, sort=False)[value].agg(how)
        return pd.DataFrame({key: g.index.to_numpy(), out: g.to_numpy()})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pandas")
    )
