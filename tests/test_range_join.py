"""Boundary semantics of the two-relation range (interval) join
``purchase_attribution``: inclusive at ``ts - window``, strictly
exclusive at ``ts``, purchases never attribute to each other, zero rows
for purchases with an empty window (left-join semantics), and no output
for users without purchases. The registry oracle covers the end-to-end
DuckDB equality; this pins the window-edge rules on a hand-built log."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from mhdb_tables2turtles_ray.pipelines.relational import purchase_attribution


def _us(sec: float) -> np.datetime64:
    return np.datetime64(int(sec * 1_000_000), "us")


def test_purchase_attribution_window_edges(ray_session, tmp_path):
    rows = [
        # user 1: two purchases and a cloud of candidate events
        (1, _us(1000.0), 1, "purchase", 99.99),
        (2, _us(940.0), 1, "click", 1.25),      # == ts-60 → included (>=)
        (3, _us(999.999999), 1, "view", 3.10),  # just before ts → included
        (4, _us(1000.0), 1, "click", 5.00),     # == ts → excluded (strict <)
        (5, _us(939.999), 1, "click", 7.77),    # before window → excluded
        (6, _us(940.0), 1, "purchase", 50.00),  # purchase in window → never counted
        # user 2: purchase with nothing before it
        (7, _us(500.0), 2, "purchase", 10.00),
        # user 3: no purchases at all → no output rows
        (8, _us(600.0), 3, "click", 2.00),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    out = (
        purchase_attribution(str(tmp_path), window_seconds=60)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expected = pd.DataFrame(
        {
            "event_id": np.array([1, 6, 7], dtype=np.int64),
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            # P1: click@940 (1.25) + view@999.999999 (3.10); P6's window
            # [880, 940) holds only click@939.999 (7.77); P7: nothing
            "n_attributed": np.array([2, 1, 0], dtype=np.int64),
            "attributed_cents": np.array([435, 777, 0], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, expected, check_dtype=False)


def test_overflow_fallback_equals_vectorized(ray_session, tmp_path, monkeypatch):
    """The per-segment overflow fallback (forced via _SHIFT_DOMAIN_MAX=0)
    must agree row-for-row with the segment-offset vectorized branch,
    for BOTH segment-offset consumers (purchase_attribution and
    events_sliding_window). Closures capture the patched module global
    at pipeline-build time, so the patch reaches Ray workers."""
    from mhdb_tables2turtles_ray.pipelines import relational

    rng = np.random.default_rng(7)
    n = 400
    users = rng.integers(1, 21, n).astype(np.int64)
    secs = rng.integers(0, 86_400, n)
    types = rng.choice(np.array(["purchase", "click", "view"]), n, p=[0.3, 0.4, 0.3])
    vals = rng.integers(0, 10_000, n) / 100.0
    table = pa.table(
        {
            "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
            "ts": pa.array(
                [_us(float(s)) for s in secs], pa.timestamp("us")
            ),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types.tolist(), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    def run():
        a = (
            relational.purchase_attribution(str(tmp_path), window_seconds=3600)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        w = (
            relational.events_sliding_window(str(tmp_path), window_seconds=3600)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        return a, w

    a_vec, w_vec = run()
    assert len(a_vec) and len(w_vec)
    monkeypatch.setattr(relational, "_SHIFT_DOMAIN_MAX", 0)
    a_fb, w_fb = run()
    pd.testing.assert_frame_equal(a_vec, a_fb)
    pd.testing.assert_frame_equal(w_vec, w_fb)
