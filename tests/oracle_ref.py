"""Straight-line reference-semantics oracle (FIXTURES.md §C).

Computes the expected triple set for a corpus DataFrame exactly the way
the reference engine would: sequential row loop, dict-of-sets
accumulation (``add_to_statements`` semantics, reference
``mhdb/ingest.py:28-76``), and — crucially — the REFERENCE'S OWN scalar
functions imported from the read-only checkout, so any divergence in our
ports shows up as a P/R loss, not a shared bug.
"""

from __future__ import annotations

import hashlib
import importlib.util
import sys

_EXCLUDE = {"EmptyValue", "", "NaN", "NAN", "nan"}


def _ref_mod():
    spec = importlib.util.spec_from_file_location(
        "ref_write_ttl_oracle", "/root/reference/mhdb/write_ttl.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_write_ttl_oracle"] = mod
    spec.loader.exec_module(mod)
    return mod


def oracle_corpus_triples(corpus_df, vocab) -> set[tuple[str, str, str]]:
    """Expected (subj, pred, obj) set for the flagship corpus pipeline."""
    ref = _ref_mod()
    check_iri, language_string = ref.check_iri, ref.language_string

    statements: dict = {}

    def add(s, p, o):
        if s in _EXCLUDE or p in _EXCLUDE or o in _EXCLUDE:
            return
        if s is None or p is None or o is None:
            return
        statements.setdefault(s, {}).setdefault(p, set()).add(o)

    alias = vocab["languages"]["alias"]

    for row in corpus_df.itertuples(index=False):
        subject = check_iri(f"{row.repo} {row.path}", "delimited")
        repo_iri = check_iri(row.repo, "delimited")
        sha = hashlib.sha256(row.content.encode("utf-8")).hexdigest()

        add(subject, "a", ":SourceFile")
        add(subject, "rdfs:label", language_string(row.path))
        add(subject, ":atCommit", f'"{row.commit}"^^xsd:string')
        add(subject, ":hasContentSha256", f'"{sha}"^^xsd:string')
        add(subject, ":belongsToRepo", repo_iri)
        canonical = alias.get(row.lang.strip().lower()) if row.lang else None
        if canonical:
            add(subject, ":hasLanguage", check_iri(canonical, "PascalCase"))

        add(repo_iri, "a", ":Repository")
        add(repo_iri, "rdfs:label", language_string(row.repo))

    langs = vocab["languages"]
    for name in langs["by_index"].values():
        iri = check_iri(name, "PascalCase")
        add(iri, "a", ":Language")
        add(iri, "rdfs:label", language_string(name))
        for curie in langs["equivalent"].get(name, []):
            add(iri, "rdfs:equivalentClass", check_iri(curie))
    for cls in (":SourceFile", ":Repository", ":Language"):
        add(cls, "a", "rdfs:Class")

    return {
        (s, p, o)
        for s, preds in statements.items()
        for p, objs in preds.items()
        for o in objs
    }


def precision_recall(ours: set, expected: set) -> tuple[float, float]:
    tp = len(ours & expected)
    precision = tp / len(ours) if ours else 1.0
    recall = tp / len(expected) if expected else 1.0
    return precision, recall
