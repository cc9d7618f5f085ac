"""Declarative EmissionSpec loading — the user-extension surface.

The reference drives its generic emission path from a CONFIG SHEET
(``structure_to_keep``, reference ``mhdb/unused_functions.py:611-749``):
users declare which sheets/columns to keep and how to emit them in a
table, not code — SURVEY.md §2.10 names this the intended way to add
sources without touching the engine. This module is that surface for
the Ray engine: a config table (JSON or Parquet, one row per emission
element) parses into the same frozen :class:`EmissionSpec` objects the
coded registry builds, so a spec defined in a file and a spec defined
in code produce byte-identical triples.

Row model (spreadsheet-shaped, like the reference's sheet):

====== =====================================================
role   meaning / used columns
====== =====================================================
subject one per spec — template, casing, truncate
type    optional — value (the ``rdf:type`` object)
label   optional — template (language-string label)
static  repeated — predicate, value
literal repeated — column, predicate, kind, lang, casing,
        truncate, split, template, strip
fk      repeated — column, predicate, lookup, casing,
        as_literal, default, split_key_by, split_value_by,
        backup_lookup (the foreign() dual-delimiter surface,
        reference ``mhdb/unused_functions.py:417-535``)
====== =====================================================

Unset cells mean "dataclass default" for defaulted fields (kind, lang,
casing) and "absent" for optional ones (truncate, split, template...).
"""

from __future__ import annotations

import json

import pyarrow as pa

from .emit import EmissionSpec, ForeignKey, Literal

_COLUMNS = (
    "spec",
    "role",
    "template",
    "casing",
    "truncate",
    "column",
    "predicate",
    "kind",
    "lang",
    "split",
    "lookup",
    "as_literal",
    "default",
    "value",
    "strip",
    "split_key_by",
    "split_value_by",
    "backup_lookup",
)


def specs_to_rows(specs) -> list[dict]:
    """EmissionSpecs → config rows (inverse of :func:`specs_from_rows`)."""
    rows: list[dict] = []

    def row(**kv) -> dict:
        base = {c: None for c in _COLUMNS}
        base.update(kv)
        return base

    for s in specs:
        rows.append(
            row(
                spec=s.name,
                role="subject",
                template=s.subject_template,
                casing=s.subject_casing,
                truncate=s.subject_truncate,
            )
        )
        if s.rdf_type is not None:
            rows.append(row(spec=s.name, role="type", value=s.rdf_type))
        if s.label_template is not None:
            rows.append(row(spec=s.name, role="label", template=s.label_template))
        for pred, obj in s.statics:
            rows.append(row(spec=s.name, role="static", predicate=pred, value=obj))
        for lit in s.literals:
            rows.append(
                row(
                    spec=s.name,
                    role="literal",
                    column=lit.column,
                    predicate=lit.predicate,
                    kind=lit.kind,
                    lang=lit.lang,
                    casing=lit.casing,
                    truncate=lit.truncate,
                    split=lit.split,
                    template=lit.template,
                    strip=lit.strip or None,
                )
            )
        for fk in s.fks:
            rows.append(
                row(
                    spec=s.name,
                    role="fk",
                    column=fk.column,
                    predicate=fk.predicate,
                    lookup=fk.lookup,
                    casing=fk.casing,
                    as_literal=fk.as_literal,
                    default=fk.default,
                    split_key_by=fk.split_key_by,
                    split_value_by=fk.split_value_by,
                    backup_lookup=fk.backup_lookup,
                )
            )
    return rows


def _get(r: dict, key: str, default=None):
    v = r.get(key)
    if v is None or (v.__class__ is float and v != v):  # parquet null → NaN
        return default
    if key == "truncate":
        return int(v)
    return v


def specs_from_rows(rows) -> tuple[EmissionSpec, ...]:
    """Config rows → EmissionSpecs (spec order = first appearance;
    element order within a spec = row order, matching the reference's
    top-to-bottom sheet semantics)."""
    order: list[str] = []
    groups: dict[str, dict] = {}
    for r in rows:
        name = r.get("spec")
        role = r.get("role")
        if not name or not role:
            raise ValueError(f"config row needs 'spec' and 'role': {r!r}")
        if name not in groups:
            order.append(name)
            groups[name] = {"subject": None, "type": None, "label": None,
                            "statics": [], "literals": [], "fks": []}
        g = groups[name]
        if role == "subject":
            if g["subject"] is not None:
                raise ValueError(f"spec {name!r}: multiple subject rows")
            g["subject"] = r
        elif role == "type":
            g["type"] = _get(r, "value")
        elif role == "label":
            g["label"] = _get(r, "template")
        elif role == "static":
            g["statics"].append((_get(r, "predicate"), _get(r, "value")))
        elif role == "literal":
            g["literals"].append(
                Literal(
                    column=_get(r, "column"),
                    predicate=_get(r, "predicate"),
                    kind=_get(r, "kind", "lang"),
                    lang=_get(r, "lang", "en"),
                    casing=_get(r, "casing", "delimited"),
                    truncate=_get(r, "truncate"),
                    split=_get(r, "split"),
                    template=_get(r, "template"),
                    strip=bool(_get(r, "strip", False)),
                )
            )
        elif role == "fk":
            g["fks"].append(
                ForeignKey(
                    column=_get(r, "column"),
                    predicate=_get(r, "predicate"),
                    lookup=_get(r, "lookup"),
                    casing=_get(r, "casing", "PascalCase"),
                    as_literal=_get(r, "as_literal"),
                    default=_get(r, "default"),
                    split_key_by=_get(r, "split_key_by"),
                    split_value_by=_get(r, "split_value_by"),
                    backup_lookup=_get(r, "backup_lookup"),
                )
            )
        else:
            raise ValueError(f"spec {name!r}: unknown role {role!r}")

    specs = []
    for name in order:
        g = groups[name]
        subj = g["subject"]
        if subj is None:
            raise ValueError(f"spec {name!r}: missing subject row")
        specs.append(
            EmissionSpec(
                name=name,
                subject_template=_get(subj, "template"),
                subject_casing=_get(subj, "casing", "PascalCase"),
                subject_truncate=_get(subj, "truncate"),
                rdf_type=g["type"],
                label_template=g["label"],
                statics=tuple(g["statics"]),
                literals=tuple(g["literals"]),
                fks=tuple(g["fks"]),
            )
        )
    return tuple(specs)


def specs_from_table(table: pa.Table) -> tuple[EmissionSpec, ...]:
    return specs_from_rows(table.to_pylist())


def specs_to_table(specs) -> pa.Table:
    rows = specs_to_rows(specs)
    return pa.table(
        {c: pa.array([r[c] for r in rows]) for c in _COLUMNS if c != "truncate"}
        | {"truncate": pa.array([r["truncate"] for r in rows], pa.int64())}
    ).select(_COLUMNS)


def dump_specs(specs, path: str) -> None:
    """Write specs to ``path`` — ``.json`` or ``.parquet`` by extension."""
    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        pq.write_table(specs_to_table(specs), path)
    else:
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"specs": specs_to_rows(specs)}, f, indent=1)


def load_specs(path: str) -> tuple[EmissionSpec, ...]:
    """Load specs from ``path`` — ``.json`` or ``.parquet`` by extension."""
    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        return specs_from_table(pq.read_table(path))
    with open(path, encoding="utf-8") as f:
        return specs_from_rows(json.load(f)["specs"])
