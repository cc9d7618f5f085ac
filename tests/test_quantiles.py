"""Exact float quantiles via iterative histogram refinement
(`stages/quantiles.py`) — pinned bit-for-bit against DuckDB
``quantile_cont`` on both synthetic float data (heavy tail, negatives,
point masses) and the real events table."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from mhdb_tables2turtles_ray.stages.quantiles import (
    exact_float_quantiles,
    exact_float_quantiles_by_group,
)


def _synthetic_table(n=20000) -> pa.Table:
    # deterministic mix: heavy lognormal-ish tail, negatives, a point
    # mass of 5000 identical values (bigger than the test gather limit)
    rng = np.random.default_rng(7)
    a = np.exp(rng.normal(0, 2.0, n // 2)) * 1000.0
    b = rng.normal(-50.0, 10.0, n // 4)
    c = np.full(n // 4, 3.141592653589793)
    v = np.concatenate([a, b, c])
    return pa.table({"v": pa.array(v, pa.float64())})


def _duck_quantiles(values: np.ndarray, qs):
    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(values, pa.float64())}))
    out = {}
    for q in qs:
        out[q] = con.execute(
            f"SELECT quantile_cont(v, {q!r}) FROM t"
        ).fetchone()[0]
    return out


def test_matches_duckdb_on_synthetic(ray_session):
    import ray

    t = _synthetic_table()
    ds = ray.data.from_arrow(t).repartition(13)
    qs = (0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    got = exact_float_quantiles(ds, "v", qs, bins=16, gather_limit=256)
    want = _duck_quantiles(t.column("v").to_numpy(), qs)
    for q in qs:
        assert got[q] == want[q], (q, got[q], want[q])


def test_point_mass_larger_than_gather_limit(ray_session):
    import ray

    # median sits inside a 5000-row point mass; gather_limit 64 forces
    # the bracket to collapse to zero width -> exact short-circuit
    v = np.concatenate(
        [np.full(5000, 42.5), np.linspace(0, 10, 1000), np.linspace(50, 99, 1000)]
    )
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v, pa.float64())}))
    got = exact_float_quantiles(ds, "v", (0.5,), bins=8, gather_limit=64)
    assert got[0.5] == 42.5


def test_nulls_and_nans_ignored(ray_session):
    import ray

    vals = pa.array([1.0, None, float("nan"), 2.0, 3.0], pa.float64())
    ds = ray.data.from_arrow(pa.table({"v": vals}))
    got = exact_float_quantiles(ds, "v", (0.5,), gather_limit=16)
    assert got[0.5] == 2.0


def test_events_value_matches_duckdb(sf_small, ray_session):
    import ray

    from mhdb_tables2turtles_ray.sources.tables import read_table

    ds = read_table(sf_small, "events", columns=["value"])
    qs = (0.5, 0.9, 0.99)
    got = exact_float_quantiles(ds, "value", qs, bins=32, gather_limit=128)
    con = duckdb.connect()
    want = {
        q: con.execute(
            f"SELECT quantile_cont(value, {q!r}) FROM "
            f"read_parquet('{sf_small}/events.parquet')"
        ).fetchone()[0]
        for q in qs
    }
    for q in qs:
        assert got[q] == want[q], (q, got[q], want[q])


def test_determinism_and_parallelism_invariance(ray_session):
    import ray

    t = _synthetic_table(4000)
    a = exact_float_quantiles(
        ray.data.from_arrow(t).repartition(3), "v", (0.5, 0.9), bins=16,
        gather_limit=128,
    )
    b = exact_float_quantiles(
        ray.data.from_arrow(t).repartition(17), "v", (0.5, 0.9), bins=16,
        gather_limit=128,
    )
    assert a == b


def test_grouped_matches_duckdb_events(sf_small, ray_session):
    import ray

    from mhdb_tables2turtles_ray.sources.tables import read_table

    ds = read_table(sf_small, "events", columns=["event_type", "value"])
    qs = (0.5, 0.9)
    got = exact_float_quantiles_by_group(
        ds, "event_type", "value", qs, bins=16, gather_limit=64
    )
    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, quantile_cont(value, 0.5), quantile_cont(value, 0.9) "
        f"FROM read_parquet('{sf_small}/events.parquet') GROUP BY event_type"
    ).fetchall()
    assert len(got) == len(rows)
    for et, p50, p90 in rows:
        assert got[et][0.5] == p50, (et, got[et][0.5], p50)
        assert got[et][0.9] == p90, (et, got[et][0.9], p90)


def test_grouped_null_keys_dropped_and_group_cap(ray_session):
    import ray

    t = pa.table(
        {
            "k": pa.array(["a", "a", None, "b", "b", "b"], pa.string()),
            "v": pa.array([1.0, 3.0, 100.0, 2.0, 4.0, 6.0], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    got = exact_float_quantiles_by_group(ds, "k", "v", (0.5,), gather_limit=16)
    assert set(got) == {"a", "b"}
    assert got["a"][0.5] == 2.0  # null-key row's 100.0 never seen
    assert got["b"][0.5] == 4.0
    with pytest.raises(ValueError, match="max_groups"):
        exact_float_quantiles_by_group(
            ds, "k", "v", (0.5,), gather_limit=16, max_groups=1
        )


def test_grouped_shares_scans_across_groups(ray_session):
    """G groups must not cost G scans: count executions via a counter
    column — each _hist_pass is ONE Dataset execution regardless of
    group count."""
    import ray

    rng = np.random.default_rng(3)
    n = 3000
    t = pa.table(
        {
            "k": pa.array((np.arange(n) % 8).astype(str)),
            "v": pa.array(rng.normal(0, 100, n), pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    got = exact_float_quantiles_by_group(
        ds, "k", "v", (0.25, 0.75), bins=8, gather_limit=32
    )
    df = t.to_pandas()
    for g, sub in df.groupby("k"):
        want25 = np.quantile(sub["v"].to_numpy(), 0.25)
        want75 = np.quantile(sub["v"].to_numpy(), 0.75)
        assert abs(got[g][0.25] - want25) < 1e-12
        assert abs(got[g][0.75] - want75) < 1e-12


def test_validation_errors(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    with pytest.raises(ValueError, match="no non-null"):
        exact_float_quantiles(ds, "v", (0.5,))
    ds2 = ray.data.from_arrow(pa.table({"v": pa.array([1.0], pa.float64())}))
    with pytest.raises(ValueError, match="outside"):
        exact_float_quantiles(ds2, "v", (1.5,))


def test_infinite_values_and_integral_ranks(ray_session):
    """±inf values flow through refinement and resolve to ±inf (the
    integral-rank short-circuit avoids inf*0 = NaN in the lerp)."""
    import ray

    v = pa.array([1.0, 2.0, float("inf")], pa.float64())
    ds = ray.data.from_arrow(pa.table({"v": v}))
    got = exact_float_quantiles(ds, "v", (0.0, 0.5, 1.0), gather_limit=16)
    assert got[0.0] == 1.0 and got[0.5] == 2.0 and got[1.0] == float("inf")
    neg = ray.data.from_arrow(
        pa.table({"v": pa.array([float("-inf"), 3.0], pa.float64())})
    )
    got2 = exact_float_quantiles(neg, "v", (0.0,), gather_limit=16)
    assert got2[0.0] == float("-inf")
