"""Column profiler: one-pass distributed stats vs exact recomputation.
Exact fields (n, n_null, min, max) must match DuckDB bit-for-bit; the
HLL distinct must land within its p=12 error envelope. The nested-type
lane (list<float> embeddings) must profile counts only — null min/max/
distinct, never a guess. A numeric column whose stringified min/max
would sort wrong ("10" < "9") pins the native-lane merge."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from mhdb_tables2turtles_ray.stages.profile import profile_table


def _rows(table: pa.Table) -> dict:
    return {r["column"]: r for r in table.to_pylist()}


def test_profile_events_exact_fields(ray_session, sf_small):
    ds = ray.data.read_parquet(f"{sf_small}/events.parquet")
    prof = _rows(profile_table(ds))
    con = duckdb.connect()
    for col in ["event_id", "ts", "user_id", "event_type", "value", "props"]:
        n, n_null, lo, hi, nd = con.execute(
            f"""SELECT count(*), count(*) - count({col}),
                       CAST(min({col}) AS VARCHAR),
                       CAST(max({col}) AS VARCHAR),
                       count(DISTINCT {col})
                FROM read_parquet('{sf_small}/events.parquet')"""
        ).fetchone()
        r = prof[col]
        assert r["n"] == n and r["n_null"] == n_null, (col, r)
        assert r["min"] == lo and r["max"] == hi, (col, r, lo, hi)
        # p=12 HLL: ±1.04/sqrt(4096) ≈ 1.6% std error; allow 5%
        assert abs(r["approx_distinct"] - nd) <= max(2, 0.05 * nd), (col, r, nd)


def test_profile_nested_column_counts_only(ray_session, sf_small):
    ds = ray.data.read_parquet(f"{sf_small}/embeddings.parquet")
    prof = _rows(profile_table(ds))
    emb = prof["embedding"]
    n = pq.read_metadata(f"{sf_small}/embeddings.parquet").num_rows
    assert emb["n"] == n and emb["n_null"] == 0
    assert emb["min"] is None and emb["max"] is None
    assert emb["approx_distinct"] is None
    # int32 label rides the int lane
    assert prof["label"]["min"] is not None


def test_profile_native_lane_merge(ray_session, tmp_path):
    # values 9 and 10 across DIFFERENT blocks: a stringified merge would
    # report max="9"; nulls must count without poisoning min/max
    t = pa.table(
        {
            "x": pa.array([9, 2, None, 10, 3], pa.int64()),
            "y": pa.array([0.5, -1.25, 3.0, None, None], pa.float64()),
            "s": pa.array(["b", "a", None, "c", "a"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "t.parquet"))
    ds = ray.data.read_parquet(str(tmp_path / "t.parquet")).repartition(5)
    prof = _rows(profile_table(ds))
    assert (prof["x"]["min"], prof["x"]["max"]) == ("2", "10")
    assert prof["x"]["n_null"] == 1 and prof["x"]["n"] == 5
    assert (prof["y"]["min"], prof["y"]["max"]) == ("-1.25", "3.0")
    assert (prof["s"]["min"], prof["s"]["max"]) == ("a", "c")
    assert prof["x"]["approx_distinct"] == 4
    assert prof["s"]["approx_distinct"] == 3


def test_profile_temporal_units_and_date32(ray_session, tmp_path):
    """Temporal min/max render in the column's OWN unit: timestamp[ns]
    (pandas' default) and date32 (days) must round-trip exactly, not be
    reinterpreted as epoch-µs."""
    import datetime

    t = pa.table(
        {
            "ts_ns": pa.array(
                [
                    datetime.datetime(2024, 1, 1, 12, 0, 0),
                    datetime.datetime(2025, 6, 30, 23, 59, 59),
                ],
                pa.timestamp("ns"),
            ),
            "d": pa.array(
                [datetime.date(2024, 1, 1), datetime.date(2025, 6, 30)],
                pa.date32(),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "t.parquet"))
    prof = _rows(profile_table(ray.data.read_parquet(str(tmp_path / "t.parquet"))))
    assert prof["ts_ns"]["min"] == "2024-01-01 12:00:00"
    assert prof["ts_ns"]["max"] == "2025-06-30 23:59:59"
    assert prof["d"]["min"] == "2024-01-01"
    assert prof["d"]["max"] == "2025-06-30"


def test_profile_empty_dataset_explicit_columns(ray_session):
    """An empty dataset with explicit columns yields zero-count rows,
    not a KeyError."""
    ds = ray.data.from_arrow(pa.table({"a": pa.array([], pa.int64())}))
    prof = profile_table(ds.filter(lambda r: False), columns=["a"])
    rows = prof.to_pylist()
    assert len(rows) == 1
    r = rows[0]
    assert r["column"] == "a" and r["n"] == 0 and r["n_null"] == 0
    assert r["min"] is None and r["max"] is None
