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

from .grouped import bucket_map


def flag_sourced(
    triples,
    provenance_predicate: str = "dcterms:isReferencedBy",
):
    """(subj, pred, obj) → (subj, pred, obj, sourced: bool).

    Bucket-WIDE vectorization (``bucket_map``): a subject is sourced iff
    it appears in the bucket's set of subjects carrying the provenance
    predicate — one boolean mask + one ``isin`` per bucket instead of a
    per-subject pandas loop (~100 µs × |subjects| saved; the coarse hash
    guarantees a subject's triples never straddle buckets)."""

    def flag(part: pd.DataFrame) -> pd.DataFrame:
        part = part.copy(deep=False)
        sourced_subjects = part.loc[
            part["pred"].eq(provenance_predicate), "subj"
        ].unique()
        part["sourced"] = part["subj"].isin(sourced_subjects)
        return part

    return bucket_map(triples, "subj", flag)
