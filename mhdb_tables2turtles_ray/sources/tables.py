"""Parquet table readers.

The big-side inputs become ``ray.data.Dataset``s (streamed, column-pruned
at the read); small lookup/vocabulary tables are read driver-side with
pyarrow and broadcast — mirroring the reference's split between entity
sheets (iterated) and lookup worksheets (probed per row, reference
``mhdb/ingest.py:3038-3056``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """Stream a testdata table as a Dataset. Always pass ``columns`` in
    pipelines — a read that loads all columns for a 2-column transform
    ships needless bytes through the object store."""
    return ray.data.read_parquet(_path(sf_dir, name), columns=columns, **kwargs)


def load_lookup(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a small lookup table (broadcast side of joins)."""
    return pq.read_table(_path(sf_dir, name), columns=columns)
