"""Deterministic vocabulary / lookup tables (the small broadcast side).

Mirrors the reference's lookup-worksheet shapes (integer ``index`` key,
comma-separated multi-FK columns — reference ``mhdb/ingest.py:3192-3196``)
and its external-ontology crosswalk waterfall
(``mhdb/ingest.py:2521-2649``), built deterministically in code — no
external data. These are tiny (tens–hundreds of rows): at cluster scale
they are broadcast once via ``ray.put`` and probed inside tasks/actors,
never shuffled.
"""

from __future__ import annotations

# --- language vocabulary (alias dictionary for entity linking) ---------
# canonical name, ISO-ish aliases (normalized lowercase), equivalent CURIEs
_LANGUAGES = [
    ("English", ["en", "eng", "english"], ["iso639-1:en"]),
    ("French", ["fr", "fra", "fre", "french"], ["iso639-1:fr"]),
    ("Spanish", ["es", "spa", "spanish"], ["iso639-1:es"]),
    ("Chinese", ["zh", "zho", "chi", "chinese"], ["iso639-1:zh"]),
    ("German", ["de", "deu", "ger", "german"], ["iso639-1:de"]),
    ("Japanese", ["ja", "jpn", "japanese"], ["iso639-1:ja"]),
]

# --- prefix registry (the resources 'ontologies' sheet equivalent,
# reference mhdb/create_mhdb:264-388) -----------------------------------
# Core prefixes (owl/rdf/rdfs/xsd) live in the fixed header preamble —
# reference mhdb/create_mhdb:390-394 — so the registry holds only the
# module-level external ontologies, like the resources 'ontologies' sheet.
PREFIXES = [
    ("dcterms", "http://purl.org/dc/terms/"),
    ("skos", "http://www.w3.org/2004/02/skos/core#"),
    ("iso639-1", "http://id.loc.gov/vocabulary/iso639-1/"),
    ("spdx", "http://spdx.org/rdf/terms#"),
    ("unusedpfx", "http://example.org/never-used#"),  # used-prefix filter test
]

BASE_URI = "http://w3id.org/graft/kg"

# Crosswalk relation types → predicate IRIs (reference mhdb/ingest.py
# :2607-2646 maps ASSERTS/HASCITATION/... and silently drops unknowns).
RELN_PREDICATES = {
    "ASSERTS": ":asserts",
    "HASCITATION": ":hasCitation",
    "HASCONDITION": ":hasCondition",
    "HASCONTRAST": ":hasContrast",
    "HASIMPLEMENTATION": ":hasImplementation",
    "HASINDICATOR": ":hasIndicator",
    "KINDOF": "rdfs:subClassOf",
    "MEASUREDBY": ":measuredBy",
    "PARTOF": "dcterms:isPartOf",
}


def language_vocab() -> dict:
    """index-keyed language lookup + normalized alias→canonical map.

    Returns ``{"by_index": {i: name}, "alias": {alias: name},
    "equivalent": {name: [curie, ...]}}``.
    """
    by_index, alias, equivalent = {}, {}, {}
    for i, (name, aliases, curies) in enumerate(_LANGUAGES):
        by_index[i] = name
        equivalent[name] = list(curies)
        alias[name.lower()] = name
        for a in aliases:
            alias[a] = name
    return {"by_index": by_index, "alias": alias, "equivalent": equivalent}


def crosswalk_tables() -> dict:
    """Five deterministic node tables with overlapping id spaces
    (waterfall priority fixture) + an id→(name, source, casing) union
    resolved in priority order, mirroring the reference's 5-table
    first-match-wins resolution (mhdb/ingest.py:2521-2649)."""
    sources = [
        ("tasks", "PascalCase"),
        ("task_implementations", "PascalCase"),
        ("task_indicators", "delimited"),
        ("task_conditions", "delimited"),
        ("task_contrasts", "delimited"),
    ]
    tables = {}
    union: dict[int, tuple[str, str, str]] = {}
    for pri, (src, casing) in enumerate(sources):
        rows = {}
        for k in range(pri * 20, pri * 20 + 30):  # ids overlap across tables
            rows[k] = f"{src} node {k}"
        tables[src] = rows
        for k, name in rows.items():
            union.setdefault(k, (name, src, casing))  # first match wins
    return {"tables": tables, "union": union, "priority": [s for s, _ in sources]}


def build_vocab_bundle() -> dict:
    """Everything the stateful stages need, as one broadcastable dict."""
    return {
        "languages": language_vocab(),
        "crosswalk": crosswalk_tables(),
        "reln_predicates": dict(RELN_PREDICATES),
        "prefixes": list(PREFIXES),
        "base_uri": BASE_URI,
    }
