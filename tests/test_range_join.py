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
