"""Indirect two-hop broadcast lookup (J3).

Reference semantics: ``get_index2`` / ``get_cells``
(``mhdb/spreadsheet_io.py:152-199, 202-271``) — the value of a cell in
table A is interpreted as a key into table B, whose row supplies the
value(s) actually emitted. Distributed shape: BOTH hops are small
dictionaries broadcast once (``ray.put``); the probe is a chained dict
lookup inside stateless ``map_batches`` — two chained broadcast joins,
zero shuffles."""

from __future__ import annotations

import pyarrow as pa


def two_hop_lookup(
    ds,
    column: str,
    hop1_ref,
    hop2_ref,
    out_col: str = "resolved",
):
    """Append ``out_col`` = hop2[hop1[row[column]]] (None on any miss)."""
    import ray

    def probe(batch: pa.Table) -> pa.Table:
        h1 = ray.get(hop1_ref) if isinstance(hop1_ref, ray.ObjectRef) else hop1_ref
        h2 = ray.get(hop2_ref) if isinstance(hop2_ref, ray.ObjectRef) else hop2_ref
        out = []
        for v in batch.column(column).to_pylist():
            mid = h1.get(v)
            out.append(h2.get(mid) if mid is not None else None)
        return batch.append_column(out_col, pa.array(out))

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
