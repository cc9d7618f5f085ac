"""Conceptualization-scheme-aware predicate selection + question
generation — the remaining reference-API surface from the legacy
generator (SURVEY.md §2.11 / M13).

- OWL vs SKOS scheme per vocabulary prefix and the matching
  equivalence/subtype predicate, falling back to ``rdfs:label`` when the
  two sides' schemes disagree (the crosswalk-compatibility rule) —
  reference ``mhdb/write_rdf.py:17-25, 216-269``.
- ``gen_questions``: flat-map generation of question variants from
  prefix/suffix parts — reference ``mhdb/unused_functions.py:898-938``.
"""

from __future__ import annotations

# scheme → (generic relation → predicate IRI), reference conceptClass
CONCEPT_CLASS = {
    "OWL": {"equivalence": "owl:equivalentClass", "subtype": "rdfs:subClassOf"},
    "SKOS": {"equivalence": "skos:exactMatch", "subtype": "skos:broadMatch"},
}


def scheme_for(curie: str, prefix_schemes: dict[str, str]) -> str:
    """Scheme ("OWL"/"SKOS") of a CURIE's vocabulary; default OWL.

    Reference ``owl_or_skos``: only a real prefixed CURIE (not a URL, not
    a base-prefix ``:x``) with a registered prefix gets its registered
    scheme."""
    if (
        ":" in curie
        and "//" not in curie
        and not curie.startswith(":")
        and curie.split(":")[0] in prefix_schemes
    ):
        return prefix_schemes[curie.split(":")[0]]
    return "OWL"


def scheme_predicate(
    left_scheme: str,
    right: str,
    prefix_schemes: dict[str, str],
    relation: str,
) -> str:
    """Predicate for linking entities across vocabularies.

    Reference ``owl_or_skos_prop``: same scheme on both sides → the
    scheme's equivalence/subtype predicate; mismatched schemes →
    ``rdfs:label`` (record the surface form rather than assert a
    cross-scheme semantic link)."""
    if left_scheme == scheme_for(right, prefix_schemes):
        return CONCEPT_CLASS[left_scheme][relation]
    return "rdfs:label"


def gen_questions(
    neutral: str,
    prefix: str | None = None,
    suffix: str | None = None,
    dim_prefix: str | None = None,
) -> list[str]:
    """Question-variant fan-out (one row → N question strings).

    Exact reference combination rules: a prefix enables the base variant
    plus suffixed and dimension-prefixed forms; without a prefix only
    suffix-driven variants exist."""
    questions: list[str] = []
    neutral = neutral.strip()
    prefix = prefix.strip() if prefix else None
    suffix = suffix.strip().strip("?") if suffix else None
    dim_prefix = dim_prefix.strip() if dim_prefix else None
    if prefix:
        questions.append(f"{prefix} {neutral}?")
        if suffix:
            questions.append(f"{prefix} {neutral} {suffix}?")
            if dim_prefix:
                questions.append(f"{dim_prefix} {prefix} {neutral} {suffix}?")
        elif dim_prefix:
            questions.append(f"{dim_prefix} {prefix} {neutral}?")
    elif suffix:
        questions.append(f"{neutral} {suffix}?")
        if dim_prefix:
            questions.append(f"{dim_prefix} {neutral} {suffix}?")
    return questions
