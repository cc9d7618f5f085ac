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
import pyarrow.compute as pc


def _batch_prefixes(batch: pa.Table) -> pa.Table:
    found: set[str] = set()
    for col in ("subj", "pred", "obj"):
        if col not in batch.column_names:
            continue
        v = batch.column(col)
        # reference gates, vectorized: has ':', no '://', not a quoted
        # literal (null-safe — null values simply fail the mask)
        mask = pc.and_kleene(
            pc.match_substring(v, ":"),
            pc.and_kleene(
                pc.invert(pc.match_substring(v, "://")),
                pc.invert(pc.starts_with(v, '"')),
            ),
        )
        vals = pc.filter(v, pc.fill_null(mask, False))
        if len(vals) == 0:
            continue
        pfx = pc.list_element(pc.split_pattern(vals, ":", max_splits=1), 0)
        found.update(
            p for p in pc.unique(pfx).to_pylist() if p
        )  # base-prefix ':x' values contribute nothing
    return pa.table({"prefix": pa.array(sorted(found), pa.string())})


def used_prefixes(triples) -> list[str]:
    """Sorted list of prefixes used anywhere in the triple Dataset.

    The per-batch set is tiny (bounded by the registry size), so the
    distinct shuffle moves a few dozen rows regardless of corpus size.
    """
    ds = triples.map_batches(
        _batch_prefixes, batch_format="pyarrow", zero_copy_batch=True
    )
    return sorted(ds.unique("prefix") or ())  # unique() → None on empty
