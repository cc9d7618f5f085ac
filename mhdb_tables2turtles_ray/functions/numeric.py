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
