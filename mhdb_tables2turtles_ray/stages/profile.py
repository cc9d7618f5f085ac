"""One-pass distributed column profiler — the audit you run over a
table BEFORE committing a 100-TB pipeline to it.

Per ``map_batches`` task, each column contributes ONE partial row
(count, null count, typed min/max, HLL registers); the driver merges
``#batches × #columns`` fixed-size rows with a streamed ``iter_batches``
(the ``stages/sketch.py`` idiom — no partial list ever resident), so one
scan of the data yields row counts, null rates, value ranges and an
approximate distinct count for every column at once.

Min/max travel in NATIVE type lanes (int64 / float64 / string) and are
only stringified at the output boundary: merging stringified numerics
would compare lexicographically ("10" < "9") and corrupt the range.
Temporal columns ride the int64 lane in their OWN storage unit
(epoch-µs for timestamp[us], epoch-ns for timestamp[ns], days for
date32, ...) and are cast back to the column's actual Arrow type at
render time — never assumed to be µs. Nested / binary columns profile
counts and nulls only (no total order, no hashable values for the
HLL) — their min/max/distinct are null, never a guess.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import HyperLogLog

_NUM_I = "i"  # int64 lane (ints, bools, timestamps as epoch-µs)
_NUM_F = "f"  # float64 lane
_STR = "s"  # string lane
_OTHER = "o"  # counts/nulls only


def _kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t) or pa.types.is_temporal(t):
        return _NUM_I
    if pa.types.is_floating(t):
        return _NUM_F
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _STR
    return _OTHER


def _cast_i64(v, t: pa.DataType):
    """Cast a scalar/array to int64; 32-bit-backed temporals (date32 /
    time32) have no direct int64 cast and need an int32 hop."""
    if pa.types.is_temporal(t) and t.bit_width == 32:
        v = pc.cast(v, pa.int32())
    return pc.cast(v, pa.int64())


def _lane_value(col: pa.ChunkedArray, kind: str, agg: str):
    """Typed min or max of a column's non-null values (None if all null)."""
    mm = pc.min_max(col)
    v = mm[agg]
    if not v.is_valid:
        return None
    if kind == _NUM_I:
        return int(_cast_i64(v, col.type).as_py())
    if kind == _NUM_F:
        return float(v.as_py())
    return str(v.as_py())


def profile_table(ds, columns: list[str] | None = None, p: int = 12) -> pa.Table:
    """Profile ``ds`` → one pyarrow row per column: ``(column, n,
    n_null, approx_distinct, min, max)`` with min/max stringified from
    the native-typed merge and ``approx_distinct`` an HLL estimate
    (±~1.6% at p=12). Runs ONE pass over the data."""

    def partial(batch: pa.Table) -> pa.Table:
        names, kinds, ns, nulls = [], [], [], []
        mins_i, maxs_i, mins_f, maxs_f, mins_s, maxs_s, regs = (
            [], [], [], [], [], [], [],
        )
        cols = columns or batch.column_names
        for name in cols:
            col = batch.column(name)
            kind = _kind(col.type)
            names.append(name)
            kinds.append(kind)
            ns.append(len(col))
            nulls.append(col.null_count)
            vmin = vmax = None
            if kind != _OTHER:
                vmin = _lane_value(col, kind, "min")
                vmax = _lane_value(col, kind, "max")
            mins_i.append(vmin if kind == _NUM_I else None)
            maxs_i.append(vmax if kind == _NUM_I else None)
            mins_f.append(vmin if kind == _NUM_F else None)
            maxs_f.append(vmax if kind == _NUM_F else None)
            mins_s.append(vmin if kind == _STR else None)
            maxs_s.append(vmax if kind == _STR else None)
            if kind == _OTHER:
                regs.append(None)
            else:
                hll = HyperLogLog(p)
                vals = col.drop_null()
                if kind == _NUM_I:
                    vals = _cast_i64(vals, col.type)
                hll.add(vals.to_numpy(zero_copy_only=False))
                regs.append(hll.registers.tobytes())
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_i": pa.array(mins_i, pa.int64()),
                "max_i": pa.array(maxs_i, pa.int64()),
                "min_f": pa.array(mins_f, pa.float64()),
                "max_f": pa.array(maxs_f, pa.float64()),
                "min_s": pa.array(mins_s, pa.string()),
                "max_s": pa.array(maxs_s, pa.string()),
                "regs": pa.array(regs, pa.binary()),
            }
        )

    state: dict[str, dict] = {}
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in b.to_pylist():
            s = state.setdefault(
                row["column"],
                {
                    "kind": row["kind"],
                    "n": 0,
                    "n_null": 0,
                    "min": None,
                    "max": None,
                    "regs": None,
                },
            )
            s["n"] += row["n"]
            s["n_null"] += row["n_null"]
            kind = s["kind"]
            lane = {"i": ("min_i", "max_i"), "f": ("min_f", "max_f"), "s": ("min_s", "max_s")}
            if kind in lane:
                lo, hi = row[lane[kind][0]], row[lane[kind][1]]
                if lo is not None:
                    s["min"] = lo if s["min"] is None else min(s["min"], lo)
                if hi is not None:
                    s["max"] = hi if s["max"] is None else max(s["max"], hi)
            if row["regs"] is not None:
                r = np.frombuffer(row["regs"], dtype=np.uint8)
                if s["regs"] is None:
                    s["regs"] = r.copy()
                else:
                    np.maximum(s["regs"], r, out=s["regs"])

    order = columns or list(state.keys())
    schema = {f.name: f.type for f in ds.schema().base_schema} if hasattr(
        ds.schema(), "base_schema"
    ) else {}

    def present(name: str, key: str):
        s = state.get(name)
        v = s[key] if s else None
        if v is None:
            return None
        t = schema.get(name)
        if s["kind"] == _NUM_I and t is not None and pa.types.is_temporal(t):
            # v is in the column's OWN storage unit (µs/ns/days/...):
            # cast the raw int back through the column's actual type —
            # 32-bit-backed temporals (date32/time32) need an int32 hop
            arr = pa.array([v], pa.int64())
            if t.bit_width == 32:
                arr = arr.cast(pa.int32())
            return str(arr.cast(t)[0].as_py())
        return str(v)

    def distinct(name: str):
        s = state.get(name)
        if s is None or s["regs"] is None:
            return None
        hll = HyperLogLog(p)
        hll.registers = s["regs"]
        return int(round(hll.estimate()))

    def stat(name: str, key: str) -> int:
        # a column never seen in any batch (empty dataset + explicit
        # columns=) profiles as zero rows, not a KeyError
        s = state.get(name)
        return s[key] if s else 0

    return pa.table(
        {
            "column": pa.array(order, pa.string()),
            "n": pa.array([stat(c, "n") for c in order], pa.int64()),
            "n_null": pa.array([stat(c, "n_null") for c in order], pa.int64()),
            "approx_distinct": pa.array(
                [distinct(c) for c in order], pa.int64()
            ),
            "min": pa.array([present(c, "min") for c in order], pa.string()),
            "max": pa.array([present(c, "max") for c in order], pa.string()),
        }
    )
