"""Numeric helpers shared by pipelines.

``round_half_away`` replicates DuckDB's ``round(x, d)`` for DOUBLE
(scale, ``std::round`` = half-away-from-zero, unscale) so rounded
floating-point outputs are bit-identical across engines. numpy's
``np.round`` / pyarrow's default round are half-to-even and DO diverge
on exactly-representable scaled ties (observed on price×discount
products in the testdata).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int):
    """Vectorized round-half-away-from-zero, matching DuckDB round()."""
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.copysign(np.floor(np.abs(arr) * scale + 0.5) / scale, arr)


def triple_multiset_digest(subj, pred, obj) -> int:
    """Order-independent digest of a triple set: sum mod 2^64 of
    vectorized 64-bit row hashes (pandas siphash of
    ``subj\\x1fpred\\x1fobj``). Commutative and mergeable — per-batch
    partial sums combine by addition, so the flagship pipeline's content
    gate needs no global sort at any scale. The same function digests
    the reference-semantics oracle's triple set to produce the pinned
    constants in the registry (tools/pin_flagship.py)."""
    import pandas as pd

    combined = (
        pd.Series(subj, dtype="object")
        + "\x1f"
        + pd.Series(pred, dtype="object")
        + "\x1f"
        + pd.Series(obj, dtype="object")
    )
    if len(combined) == 0:
        return 0
    h = pd.util.hash_array(combined.to_numpy(dtype=object))
    return int(h.sum(dtype=np.uint64))


def list_column_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow ``list<float>`` column → dense (n_rows, dim) ndarray.

    Zero-copy-ish fast path when all lists share one length (the
    embedding-table invariant): one buffer view + reshape instead of a
    per-row Python materialization — the hot-path prep for every
    matmul-per-batch similarity op. Falls back to the row-wise path for
    ragged or null-bearing columns.
    """
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type) and arr.null_count == 0:
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), arr.type.list_size).astype(dtype, copy=False)
    if (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)) and (
        arr.null_count == 0
    ):
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = arr.values.to_numpy(zero_copy_only=False)
            return (
                flat[offsets[0] : offsets[-1]]
                .reshape(len(arr), widths[0])
                .astype(dtype, copy=False)
            )
    return np.asarray([np.asarray(v, dtype=dtype) for v in arr.to_pylist()])
