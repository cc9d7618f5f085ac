"""Deterministic in-group ordinal enumeration.

The reference keeps a running per-questionnaire question counter whose
value feeds the subject IRI (``{questionnaire}_Q{n}``, reference
``mhdb/ingest.py:2125-2140``) — order-sensitive driver-loop state. Under
parallelism that must NOT depend on block arrival order, so it becomes a
coarse-bucketed grouped map (``stages/grouped.py``) with a stable
in-group sort on an explicit ordinal column (carried from the source),
exactly as SURVEY.md §2.3 ST2 prescribes.
"""

from __future__ import annotations

import pandas as pd

from .grouped import sorted_bucket_map


def enumerate_in_groups(
    ds,
    group_key: str,
    order_by: list[str],
    out_col: str = "ordinal",
    start: int = 1,
):
    """Append ``out_col`` = 1-based rank within ``group_key`` ordered by
    ``order_by`` (a deterministic total order — include a unique
    tiebreaker column).

    This is a shuffle on a coarse hash bucket of ``group_key`` (one task
    per bucket); the rank is ONE vectorized ``groupby.cumcount`` over
    the bucket sorted by (key, order_by) — no per-fine-group Python
    (``stages/grouped.py:sorted_bucket_map``). Group size must fit a
    worker (true for per-questionnaire/per-user groups; salt or window
    by range if a key ever exceeds block size).
    """

    def rank_bucket(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy(deep=False)
        part[out_col] = (
            part.groupby(group_key, sort=False).cumcount() + start
        )
        return part

    return sorted_bucket_map(ds, group_key, order_by, rank_bucket)
