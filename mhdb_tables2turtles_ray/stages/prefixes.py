"""Used-prefix aggregation for the Turtle header.

Reference semantics (``mhdb/create_mhdb:244-259``): scan every subject,
predicate and object; any CURIE-shaped value (contains ``:``, is not a
``<...>`` IRI and not a quoted literal) contributes its prefix; the
prefix registry is then filtered to the used set for the header.

Distributed as: projection ``map_batches`` → tiny distinct shuffle →
small driver-side result (A2 in SURVEY.md §2.5).
"""

from __future__ import annotations

import pyarrow as pa


def _batch_prefixes(batch: pa.Table) -> pa.Table:
    found: set[str] = set()
    for col in ("subj", "pred", "obj"):
        if col not in batch.column_names:
            continue
        for v in batch.column(col).to_pylist():
            if v is None or not isinstance(v, str):
                continue
            # reference gates: has ':', no '://', not a quoted literal
            if ":" not in v or "://" in v or v.startswith('"'):
                continue
            pfx = v.split(":", 1)[0]
            if pfx:  # base-prefix ':x' values contribute nothing
                found.add(pfx)
    return pa.table({"prefix": pa.array(sorted(found), pa.string())})


def used_prefixes(triples) -> list[str]:
    """Sorted list of prefixes used anywhere in the triple Dataset.

    The per-batch set is tiny (bounded by the registry size), so the
    distinct shuffle moves a few dozen rows regardless of corpus size.
    """
    ds = triples.map_batches(
        _batch_prefixes, batch_format="pyarrow", zero_copy_batch=True
    )
    return sorted(ds.unique("prefix"))
