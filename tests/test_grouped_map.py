"""Direct tests for the coarse-bucketed grouped map (stages/grouped.py):
the at-scale groupby(key).map_groups substitute used by asof,
sessionize, enumerate, flag_sourced, sliding-window and sampling."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _run(items, key, fn, num_buckets):
    import ray.data

    from mhdb_tables2turtles_ray.stages.grouped import grouped_map

    ds = ray.data.from_items(items).repartition(3)
    return grouped_map(ds, key, fn, num_buckets=num_buckets).take_all()


def test_group_integrity_int_and_string_keys(ray_session):
    """fn must always see WHOLE groups — every row of a key in one call."""

    def whole(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": [g["k"].iloc[0]], "n": [len(g)], "s": [int(g["v"].sum())]}
        )

    items = [{"k": i % 7, "v": i} for i in range(100)]
    got = {r["k"]: (r["n"], r["s"]) for r in _run(items, "k", whole, 4)}
    expect = pd.DataFrame(items).groupby("k")["v"].agg(["count", "sum"])
    assert got == {
        int(k): (int(row["count"]), int(row["sum"]))
        for k, row in expect.iterrows()
    }

    items_s = [{"k": f"key-{i % 5}", "v": i} for i in range(60)]
    got_s = {r["k"]: r["n"] for r in _run(items_s, "k", whole, 8)}
    assert got_s == {f"key-{i}": 12 for i in range(5)}


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([1, 2, 7, 256]),
)
def test_matches_pandas_groupby(ray_session, rows, num_buckets):
    """grouped_map ≡ plain pandas groupby-apply for any data and any
    bucket count (bucketing is a pure implementation detail)."""

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v", kind="mergesort").reset_index(drop=True)
        g["r"] = range(len(g))
        return g

    items = [{"k": k, "v": v} for k, v in rows]
    got = {(r["k"], r["v"], r["r"]) for r in _run(items, "k", rank, num_buckets)}
    df = pd.DataFrame(items)
    expect = set()
    for _, g in df.groupby("k", sort=False):
        g = g.sort_values("v", kind="mergesort").reset_index(drop=True)
        for i, row in g.iterrows():
            expect.add((row["k"], row["v"], i))
    assert got == expect


def test_single_bucket_degenerates_gracefully(ray_session):
    def count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "n": [len(g)]})

    got = {r["k"]: r["n"] for r in _run(
        [{"k": i % 3, "v": i} for i in range(30)], "k", count, 1
    )}
    assert got == {0: 10, 1: 10, 2: 10}


# --- bucketed_agg: the scalar-aggregation sibling ----------------------


def _agg(items, key, value, how, **kw):
    import ray.data

    from mhdb_tables2turtles_ray.stages.grouped import bucketed_agg

    ds = ray.data.from_items(items).repartition(3)
    return bucketed_agg(ds, key, value, how=how, **kw).take_all()


@pytest.mark.parametrize("how", ["sum", "min", "max"])
def test_bucketed_agg_matches_pandas(ray_session, how):
    """Equivalence to a plain fine-key groupby, all three reductions,
    with keys spread across buckets and batches."""
    items = [{"k": i % 37, "v": (i * 13) % 101 - 50} for i in range(500)]
    got = {r["k"]: r["v"] for r in _agg(items, "k", "v", how, num_buckets=8)}
    expect = pd.DataFrame(items).groupby("k")["v"].agg(how)
    assert got == {int(k): int(v) for k, v in expect.items()}
    # int64 in -> int64 out (the pandas nullable-Int64 block-layer trap)
    assert all(isinstance(r["v"], int) for r in _agg(items, "k", "v", how))


def test_bucketed_agg_float_and_rename(ray_session):
    items = [{"k": i % 5, "v": float(i) / 8} for i in range(80)]
    rows = _agg(items, "k", "v", "sum", out="total")
    got = {r["k"]: r["total"] for r in rows}
    expect = pd.DataFrame(items).groupby("k")["v"].sum()
    for k, v in expect.items():
        assert got[int(k)] == pytest.approx(v, rel=1e-12)


def test_bucketed_agg_rejects_unknown_how(ray_session):
    with pytest.raises(ValueError, match="sum/min/max"):
        _agg([{"k": 1, "v": 1}], "k", "v", "mean")


def test_bucketed_agg_distinct_keys_shape(ray_session):
    """value == key with a renamed out column = distinct keys."""
    items = [{"k": i % 11} for i in range(200)]
    rows = _agg(items, "k", "k", "min", out="__d")
    assert sorted(r["k"] for r in rows) == list(range(11))
    assert all(r["__d"] == r["k"] for r in rows)


def test_sorted_bucket_map_equals_grouped_map(ray_session):
    """Bucket-wide vectorized shape ≡ per-group loop shape on the same
    per-user cumulative rule (the contract sessionize/asof rely on).
    The micro-bench motivation: the loop pays ~100 µs of pandas object
    overhead per fine group (381x slower at 10k groups/bucket)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from mhdb_tables2turtles_ray.stages.grouped import (
        grouped_map,
        sorted_bucket_map,
    )

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 400, n).astype(np.int64),
            "t": rng.integers(0, 10**6, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "v"], kind="mergesort").reset_index(drop=True)
        g["cum"] = g["v"].cumsum()
        return g[["k", "t", "v", "cum"]]

    def bucket_wide(part: pd.DataFrame) -> pd.DataFrame:
        part = part.assign(
            cum=part.groupby("k", sort=False)["v"].cumsum()
        )
        return part[["k", "t", "v", "cum"]]

    a = (
        grouped_map(ds, "k", per_group)
        .to_pandas()
        .sort_values(["k", "t", "v"])
        .reset_index(drop=True)
    )
    b = (
        sorted_bucket_map(ds, "k", ["t", "v"], bucket_wide)
        .to_pandas()
        .sort_values(["k", "t", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# --- bucket_map: the unsorted whole-bucket sibling ----------------------


def test_bucket_map_group_integrity_and_equivalence(ray_session):
    """bucket_map's fn sees whole groups only (never a split key), and a
    bucket-wide EXISTS flag matches the per-group answer for any bucket
    count."""
    import ray.data

    from mhdb_tables2turtles_ray.stages.grouped import bucket_map

    items = [
        {"k": i % 11, "tag": "hit" if i % 23 == 0 else "miss", "v": i}
        for i in range(200)
    ]
    df = pd.DataFrame(items)
    expect_flag = df.groupby("k")["tag"].apply(lambda s: bool((s == "hit").any()))

    def flag(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy(deep=False)
        hit_keys = part.loc[part["tag"].eq("hit"), "k"].unique()
        part["flag"] = part["k"].isin(hit_keys)
        return part

    for num_buckets in (1, 4, 256):
        ds = ray.data.from_items(items).repartition(3)
        out = bucket_map(ds, "k", flag, num_buckets=num_buckets).to_pandas()
        assert len(out) == len(df)
        got = out.groupby("k")["flag"].agg(["all", "any"])
        # every row of a key got the SAME flag (whole-group visibility)
        assert (got["all"] == got["any"]).all()
        assert {int(k): bool(v) for k, v in got["any"].items()} == {
            int(k): bool(v) for k, v in expect_flag.items()
        }
