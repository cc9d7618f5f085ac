"""Sourced/unsourced output partitioning (J6).

Reference semantics: the generic config-driven path splits emitted
statements into *sourced* vs *unsourced* graphs by whether the subject
carries a ``dcterms:isReferencedBy`` statement
(``mhdb/unused_functions.py:611-749``, ``structure_to_keep``).

Distributed shape: one coarse-bucketed shuffle on the subject
(``stages/grouped.py``) flags every subject's triples together (the
provenance predicate must see all of a subject's triples to classify
them); the result carries a ``sourced`` flag column so downstream can
``filter`` either side — or materialize each side to its own directory —
without re-running the pipeline."""

from __future__ import annotations

import pandas as pd

from .grouped import grouped_map


def flag_sourced(
    triples,
    provenance_predicate: str = "dcterms:isReferencedBy",
):
    """(subj, pred, obj) → (subj, pred, obj, sourced: bool)."""

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["sourced"] = bool((g["pred"] == provenance_predicate).any())
        return g

    return grouped_map(triples, "subj", flag)
