"""Name-composition join (J7): canonical entity display-name + IRI-label
construction from joined lookup parts.

Reference semantics: the disorders emitter builds the canonical disorder
name by appending severity / specifier / criterion / ICD-code fragments
to both the display label and the IRI label with position-dependent
separators (``mhdb/ingest.py:655-736``): a *tagged* part appends
``"; {tag}: {value}"`` / ``" {tag} {value}"``; a *continuation* part
(the second criterion of a pair) appends ``", {value}"`` / ``" {value}"``;
an ICD code appends ``"; {PREFIX}:{code}"`` / ``" {TAG} {code}"``. The
composed IRI label is then minted PascalCase — so canonical-subject
identity (the dedup key) depends on these exact separators.
"""

from __future__ import annotations

from dataclasses import dataclass

from .strings import check_iri


@dataclass(frozen=True)
class Part:
    """One composition fragment.

    style:
      - ``"tagged"``       → label ``"; {tag}: {value}"``, iri ``" {tag} {value}"``
      - ``"continuation"`` → label ``", {value}"``,        iri ``" {value}"``
      - ``"code"``         → label ``"; {tag}:{value}"``,  iri ``" {iri_tag} {value}"``
    """

    tag: str
    value: str
    style: str = "tagged"
    iri_tag: str | None = None


def compose_entity_name(base: str, parts: list[Part]) -> tuple[str, str, str]:
    """Return (display_label, iri_label, iri) for a composed entity."""
    label = base
    iri_label = base
    for p in parts:
        if not p.value:
            continue
        if p.style == "tagged":
            label += "; {0}: {1}".format(p.tag, p.value)
            iri_label += " {0} {1}".format(p.tag, p.value)
        elif p.style == "continuation":
            label += ", {0}".format(p.value)
            iri_label += " {0}".format(p.value)
        elif p.style == "code":
            label += "; {0}:{1}".format(p.tag, p.value)
            iri_label += " {0} {1}".format(p.iri_tag or p.tag, p.value)
        else:
            raise ValueError(f"unknown part style {p.style!r}")
    return label, iri_label, check_iri(iri_label, "PascalCase")


def icd_curie(version: int, code) -> str:
    """``ICD{9,10}CM:code`` CURIE (reference mhdb/ingest.py:658-667;
    legacy variant mhdb/unused_functions.py:23-46)."""
    return "ICD{0}CM:{1}".format(version, code)


def doi_statements(doi: str, title: str | None = None, statements=None) -> dict:
    """Statements about a DOI — reference ``doi_iri``
    (``mhdb/unused_functions.py:752-810``).

    The reference function is DEAD CODE: it calls ``add_if``, which is
    defined nowhere in the repo (same broken-reference family as
    ``create_label``; its docstring example also shows an un-destroyed
    URL the actual ``check_iri`` cannot produce). Semantics are
    reconstructed from the call shape: a nested statements dict
    ``{subject: {predicate: {objects}}}`` keyed by the check_iri-minted
    ``https://dx.doi.org/{doi}`` IRI (URL-destruction quirk included),
    carrying the datacite identifier pair and an optional
    language-string title label.
    """
    from .strings import language_string

    statements = {} if statements is None else statements
    local_iri = check_iri("https://dx.doi.org/{0}".format(doi))
    doi_lit = '"""{0}"""^^rdfs:Literal'.format(doi)
    preds = [
        ("datacite:usesIdentifierScheme", "datacite:doi"),
        ("datacite:hasIdentifier", doi_lit),
    ]
    if title:
        preds.append(("rdfs:label", language_string(title)))
    bucket = statements.setdefault(local_iri, {})
    for pred, obj in preds:
        bucket.setdefault(pred, set()).add(obj)
    return statements
