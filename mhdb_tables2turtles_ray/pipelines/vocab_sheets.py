"""Lookup-worksheet emission family: index-keyed sheets with
self-referencing multi-FK parent columns and a default parent fallback.

Reference shape: the languages/licenses worksheets
(``mhdb/ingest.py:1699-1784``) — subject minted PascalCase from the name
column, label, comma-separated ``indices_*`` self-FKs resolved against
the SAME sheet's ``index`` column into ``rdfs:subClassOf`` links (with a
``:Language``-style default when no parent), plus raw pass-through
``equivalentClasses``. Expressed as one :class:`EmissionSpec` against
the generic engine + a driver-side dict of the sheet's own index column
(broadcast self-join)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.emit import EmissionSpec, ForeignKey, Literal, emit_triples

LANGUAGE_SHEET_SPEC = EmissionSpec(
    name="languages_sheet",
    subject_template="{language}",
    subject_casing="PascalCase",
    label_template="{language}",
    literals=(
        Literal(
            column="equivalentClasses",
            predicate="rdfs:equivalentClass",
            kind="raw",
            split=",",
        ),
    ),
    fks=(
        ForeignKey(
            column="indices_language",
            predicate="rdfs:subClassOf",
            lookup="languages_sheet",
            casing="PascalCase",
            default=":Language",
        ),
    ),
)


def fixture_languages_sheet() -> pa.Table:
    """Deterministic languages-worksheet fixture: self-FK chains, multi
    parents, a dangling parent index, nulls, comma CURIE lists."""
    return pa.table(
        {
            "index": [0, 1, 2, 3, 4, 5],
            "language": [
                "Indo-European",
                "Germanic",
                "Romance",
                "English",
                "Spanish",
                None,  # excluded row
            ],
            "indices_language": [None, "0", "0", "1, 0", "2", "1"],
            "equivalentClasses": [
                None,
                "iso639-5:gem",
                "iso639-5:roa, wikidata:Q19814",
                "iso639-1:en",
                "",
                None,
            ],
        }
    )


def language_sheet_triples(sheet: pa.Table | None = None) -> ray.data.Dataset:
    sheet = sheet if sheet is not None else fixture_languages_sheet()
    lookup = {
        "languages_sheet": dict(
            zip(
                sheet.column("index").to_pylist(),
                sheet.column("language").to_pylist(),
            )
        )
    }
    return emit_triples(ray.data.from_arrow(sheet), [LANGUAGE_SHEET_SPEC], lookup)
