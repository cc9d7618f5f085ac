"""TBox emission: the Classes / Properties worksheet family.

Every reference workbook carries a ``Classes`` and a ``Properties``
sheet (ontology TBox) with fixed emission rules
(``mhdb/ingest.py:3084-3148``, repeated per module at :125-189 etc):

- Classes: subject ``check_iri(ClassName)``; ``a rdf:Class``; lang
  label; optional comment; ``owl:sameAs`` RAW pass-through;
  ``equivalentClasses`` comma-split RAW; ``subClassOf`` minted.
- Properties: subject ``check_iri(property)``; ``a rdf:Property``;
  label; minted domain/range; comment; RAW sameAs/equivalentProperty;
  minted subPropertyOf.

Here both are plain :class:`EmissionSpec` instances — proof the generic
engine covers the reference's hand-unrolled TBox loops — plus
deterministic fixture tables (FIXTURES.md §B6/B7) exercising nulls,
comma lists and CURIE pass-through."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.emit import EmissionSpec, Literal, emit_triples

CLASSES_SPEC = EmissionSpec(
    name="tbox_classes",
    subject_template="{ClassName}",
    subject_casing="delimited",
    rdf_type="rdf:Class",
    literals=(
        Literal(column="label", predicate="rdfs:label", kind="lang"),
        Literal(column="definition", predicate="rdfs:comment", kind="lang"),
        Literal(column="sameAs", predicate="owl:sameAs", kind="raw"),
        Literal(
            column="equivalentClasses",
            predicate="rdfs:equivalentClass",
            kind="raw",
            split=",",
        ),
        Literal(column="subClassOf", predicate="rdfs:subClassOf", kind="iri"),
    ),
)

PROPERTIES_SPEC = EmissionSpec(
    name="tbox_properties",
    subject_template="{property}",
    subject_casing="delimited",
    rdf_type="rdf:Property",
    literals=(
        Literal(column="label", predicate="rdfs:label", kind="lang"),
        Literal(column="propertyDomain", predicate="rdfs:domain", kind="iri"),
        Literal(column="propertyRange", predicate="rdfs:range", kind="iri"),
        Literal(column="definition", predicate="rdfs:comment", kind="lang"),
        Literal(column="sameAs", predicate="owl:sameAs", kind="raw"),
        Literal(
            column="equivalentProperty",
            predicate="rdfs:equivalentProperty",
            kind="raw",
        ),
        Literal(column="subPropertyOf", predicate="rdfs:subPropertyOf", kind="iri"),
    ),
)


def fixture_classes_table() -> pa.Table:
    """Deterministic Classes-sheet fixture (nulls, comma lists, CURIEs)."""
    return pa.table(
        {
            "ClassName": ["Source File", "Repository", "Programming Language", "Dead Class"],
            "label": ["source file", "repository", "programming language", None],
            "definition": ["a file in a repo", None, "a language", "nan"],
            "sameAs": [None, "schema:SoftwareSourceCode", None, None],
            "equivalentClasses": ["schema:File, fabio:Work", None, "", None],
            "subClassOf": [":Artifact", ":Artifact", None, None],
        }
    )


def fixture_properties_table() -> pa.Table:
    return pa.table(
        {
            "property": ["has language", "at commit", "belongs to repo"],
            "label": ["has language", "at commit", "belongs to repo"],
            "propertyDomain": [":SourceFile", ":SourceFile", None],
            "propertyRange": [":Language", None, ":Repository"],
            "definition": [None, "commit of record", None],
            "sameAs": ["schema:inLanguage", None, None],
            "equivalentProperty": [None, None, "schema:isPartOf"],
            "subPropertyOf": [None, None, ":isPartOf"],
        }
    )


def tbox_triples_from_tables(
    classes: pa.Table | None = None, properties: pa.Table | None = None
) -> ray.data.Dataset:
    """Fixture tables → TBox triples Dataset via the generic engine."""
    classes = classes if classes is not None else fixture_classes_table()
    properties = properties if properties is not None else fixture_properties_table()
    cls_ds = emit_triples(ray.data.from_arrow(classes), [CLASSES_SPEC])
    prop_ds = emit_triples(ray.data.from_arrow(properties), [PROPERTIES_SPEC])
    return cls_ds.union(prop_ds)
