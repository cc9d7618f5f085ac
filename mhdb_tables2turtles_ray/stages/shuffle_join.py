"""Shuffle hash join — both sides big (neither fits a broadcast).

The missing member of the join family (broadcast lookup, semi/anti,
two-hop and as-of are elsewhere): tag each side, hash-partition BOTH on
the key into ``num_buckets`` coarse buckets (one all-to-all total —
rows of a key land in the same bucket task), and pandas-merge inside
each bucket. Skewed keys are bounded by the bucket granularity the same
way the grouped-map family is; salt the key upstream if a single key
exceeds a worker (same contract as ``stages/grouped.py``).

At 10^12-row scale this is the operator to AVOID when one side is
small (use ``ray.put`` + map_batches lookup) or when only existence
matters (``stages/semijoin.py``); it exists for the genuinely
big-⋈-big case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_BUCKET = "__join_bucket"
_SIDE = "__join_side"


def _nullable_side_cols(how: str, left_cols, right_cols) -> list[str]:
    """The output columns a given join type can NaN-fill."""
    return {
        "inner": [],
        "left": list(right_cols),
        "right": list(left_cols),
        "outer": [*left_cols, *right_cols],
    }[how]


def _nullable_dtypes(ds, cols) -> dict:
    """Plan-time output dtypes for the NaN-fillable columns of one join
    side, derived from that side's schema: numeric → float64 (NaN is a
    float), temporal → its own datetime64 (NaT), everything else →
    object. Enforcing these in EVERY task keeps output block schemas
    identical whether or not a particular bucket/batch happened to
    contain an unmatched row — the divergence (int64 where all rows
    matched, float64 where one didn't) otherwise breaks downstream
    Arrow conversion on the mixed lineage.

    Returns {} without touching the dataset when ``cols`` is empty
    (inner joins, or a side with no nullable columns): ``ds.schema()``
    EXECUTES the upstream plan's UDFs on a non-materialized dataset
    (verified on Ray 2.49), so it must only be paid when the dtype map
    is actually needed. A schema of None (truly empty lineage) also
    yields {} — the join result is empty/unmatched anyway."""
    import pyarrow as pa

    if not cols:
        return {}
    sch = ds.schema()
    if sch is None:
        return {}
    out = {}
    for name, t in zip(sch.names, sch.types):
        if name not in cols:
            continue
        if isinstance(t, pa.DataType):
            if pa.types.is_integer(t) or pa.types.is_floating(t):
                out[name] = np.float64
            elif pa.types.is_temporal(t):
                out[name] = t.to_pandas_dtype()
            else:
                out[name] = object
        else:
            dt = np.dtype(t)
            if np.issubdtype(dt, np.integer) or np.issubdtype(dt, np.floating):
                out[name] = np.float64
            elif np.issubdtype(dt, np.datetime64):
                out[name] = dt
            else:
                out[name] = object
    return out


def _enforce_dtypes(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
    for c, dt in dtypes.items():
        df[c] = df[c].astype(dt)
    return df


def hash_join(
    left,
    right,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 256,
    how: str = "inner",
    hot_keys=None,
    salt: int = 8,
):
    """Join two Datasets on ``on``; output columns = [on] + left_cols +
    right_cols. ``how``: "inner", "left", "right" or "outer". Column
    names must not collide across sides (rename upstream with a
    map_batches if they do). Because the bucket exchange PARTITIONS the
    key space (every row of a key lands in exactly one bucket), the
    per-bucket pandas merge composes to the correct global join for
    every ``how`` — an unmatched row is unmatched in its one bucket and
    nowhere else. For right/outer the nullable side's integer columns
    are normalized to float64 (pandas NaN semantics) in EVERY bucket,
    not just the buckets that happened to have unmatched rows —
    otherwise block schemas diverge by bucket.

    ``hot_keys`` + ``salt``: explicit skew handling — each listed hot
    key's LEFT rows spread across ``salt`` private sub-buckets (salted
    by a content hash — deterministic, block-structure-independent)
    while its RIGHT rows REPLICATE into all ``salt`` sub-buckets, so
    every left row still sees every match. Results are identical to the
    unsalted join (tested); only task balance changes. Use when one key
    would otherwise exceed a single bucket task. Salting is only valid
    when unmatched RIGHT rows never emit ("inner"/"left"): a replicated
    right row that matches in one sub-bucket is unmatched in the other
    salt-1, so right/outer would emit phantom null rows — rejected
    loudly instead.
    """
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    if hot_keys and how in ("right", "outer"):
        raise ValueError(
            "hot_keys salting replicates right rows and would emit one "
            "phantom unmatched row per extra sub-bucket under "
            f"how={how!r}; salt the key upstream or use how='left' with "
            "the sides swapped"
        )
    all_cols = [on, *left_cols, *right_cols]
    hot_index = {k: i for i, k in enumerate(hot_keys)} if hot_keys else {}

    def pack(side: int, keep: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({on: df[on]})
            for c in all_cols[1:]:
                out[c] = df[c] if c in keep else None
            out[_SIDE] = np.int8(side)
            out[_BUCKET] = (
                pd.util.hash_array(df[on].to_numpy()) % np.uint64(num_buckets)
            ).astype(np.int64)
            if hot_index:
                hot_pos = df[on].map(hot_index)
                is_hot = hot_pos.notna().to_numpy()
                if is_hot.any():
                    base = num_buckets + hot_pos.to_numpy(
                        dtype=float, na_value=0
                    ).astype(np.int64) * salt
                    if side == 0:
                        sub = (
                            pd.util.hash_pandas_object(df, index=False).to_numpy()
                            % np.uint64(salt)
                        ).astype(np.int64)
                        out.loc[is_hot, _BUCKET] = (base + sub)[is_hot]
                    else:
                        # replicate hot right rows into every sub-bucket
                        rep = out[is_hot]
                        frames = [out[~is_hot]]
                        for s in range(salt):
                            r = rep.copy()
                            r[_BUCKET] = base[is_hot] + s
                            frames.append(r)
                        out = pd.concat(frames, ignore_index=True)
            return out

        return fn

    tagged = left.select_columns([on, *left_cols]).map_batches(
        pack(0, left_cols), batch_format="pandas"
    ).union(
        right.select_columns([on, *right_cols]).map_batches(
            pack(1, right_cols), batch_format="pandas"
        )
    )

    nullable = _nullable_side_cols(how, left_cols, right_cols)
    nullable_dtypes = {
        **_nullable_dtypes(left, [c for c in nullable if c in left_cols]),
        **_nullable_dtypes(right, [c for c in nullable if c in right_cols]),
    }

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        # the union padded each side's absent columns with None (object
        # dtype); infer_objects restores the native dtype of the REAL
        # values before the merge, then the plan-time nullable dtypes
        # are enforced so every bucket emits the same block schema
        ldf = part[part[_SIDE] == 0][[on, *left_cols]].infer_objects()
        rdf = part[part[_SIDE] == 1][[on, *right_cols]].infer_objects()
        return _enforce_dtypes(
            ldf.merge(rdf, on=on, how=how)[all_cols], nullable_dtypes
        )

    return tagged.groupby(_BUCKET).map_groups(merge, batch_format="pandas")


def detect_hot_keys(
    ds,
    col: str,
    hot_fraction: float = 0.01,
    per_batch_k: int = 16,
) -> list:
    """Approximate heavy hitters of ``ds[col]`` — the keys a bucket
    shuffle must salt. Per-batch top-``per_batch_k`` value counts are
    the partials (tiny, fixed-size rows — a full groupby(count) would
    shuffle every key), merged by a Ray groupby; keys whose merged
    count exceeds ``hot_fraction`` of the NON-NULL key rows are hot
    (null keys don't join, so they don't dilute the threshold).
    Approximate in the standard space-saving sense: a key spread thinly
    below every batch's top-k can be missed, but any key holding ≥
    hot_fraction of a batch's rows at shuffle-breaking skew levels
    cannot hide."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts().head(per_batch_k)
        out = pd.DataFrame({col: vc.index, "n": vc.to_numpy()})
        # the FIRST row of each partial carries the batch's NON-NULL key
        # count (a None-key sentinel row would coerce integer key
        # columns to float64 and corrupt 64-bit keys; counting non-null
        # keys keeps hot_fraction relative to actual join keys — an
        # all-null batch emits no rows and correctly contributes 0)
        out["marker_rows"] = 0
        if len(out):
            out.iloc[0, out.columns.get_loc("marker_rows")] = int(
                df[col].notna().sum()
            )
        return out

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas"
    ).materialize()  # consumed twice: total + merge; ≤k tiny rows/batch
    total = int(parts.sum("marker_rows") or 0)
    if total == 0:
        return []
    # merge candidate counts with a Ray groupby — the driver only ever
    # sees the DISTINCT candidate keys, not per-batch partial rows
    merged = (
        parts.groupby(col).aggregate(Sum("n", alias_name="n")).to_pandas()
    )
    hot = merged[merged["n"] >= hot_fraction * total][col]
    return sorted(hot.tolist())


def auto_join(
    left,
    right,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    broadcast_threshold: int = 2_000_000,
    num_buckets: int = 256,
    hot_keys=None,
    salt: int = 8,
):
    """Strategy-selecting join (the default entry point of the join
    family): counts the RIGHT side once — at or under
    ``broadcast_threshold`` rows it is collected, broadcast via
    ``ray.put`` and probed per left batch (ZERO shuffle, the correct
    plan for dimension tables at any corpus size); above it the
    tagged-union shuffle hash join runs (one all-to-all, the
    big-⋈-big plan). Results are identical either way (pinned by
    test), mirroring ``stages/semijoin.py``'s exact/Bloom threshold
    switch so the scale-safe choice is the DEFAULT, not an option the
    caller must remember. ``right`` is materialized once up front
    (object-store-backed, spillable) so the count and the subsequent
    broadcast/shuffle consumption execute its pipeline exactly once.

    ``how="right"``/``"outer"`` always take the shuffle path regardless
    of size: the broadcast probe's per-left-batch pandas merge would
    re-emit every unmatched right row once per batch (no global view of
    which right keys matched SOME batch), so those semantics are only
    expressible where the key space is partitioned."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    right = right.materialize()
    if how in ("right", "outer") or right.count() > broadcast_threshold:
        return hash_join(
            left, right, on, left_cols, right_cols,
            num_buckets=num_buckets, how=how, hot_keys=hot_keys, salt=salt,
        )
    import ray

    all_cols = [on, *left_cols, *right_cols]
    # how is "inner" or "left" here, so only right columns can be
    # NaN-filled; enforce their plan-time dtypes per batch so a batch
    # where every left row matched emits the same schema as one where
    # a row didn't
    nullable_dtypes = _nullable_dtypes(
        right, _nullable_side_cols(how, left_cols, right_cols)
    )
    ref = ray.put(right.select_columns([on, *right_cols]).to_pandas())

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        return _enforce_dtypes(
            df[[on, *left_cols]].merge(r, on=on, how=how)[all_cols],
            nullable_dtypes,
        )

    return left.select_columns([on, *left_cols]).map_batches(
        probe, batch_format="pandas"
    )
