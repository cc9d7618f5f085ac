"""Operator-level unit tests: emission specs, FK handling/quarantine,
linker, crosswalk waterfall, enumeration, prefix aggregation."""

from __future__ import annotations

import pyarrow as pa
import pytest

from mhdb_tables2turtles_ray.stages.emit import (
    EmissionSpec,
    ForeignKey,
    Literal,
    TripleEmitter,
    fk_keys,
    is_excluded,
)


def _triples(table):
    return set(
        zip(
            table.column("subj").to_pylist(),
            table.column("pred").to_pylist(),
            table.column("obj").to_pylist(),
        )
    )


def test_exclude_semantics():
    assert is_excluded(None)
    assert is_excluded("")
    assert is_excluded("nan") and is_excluded("NaN") and is_excluded("NAN")
    assert is_excluded(float("nan"))
    assert not is_excluded("None")  # golden-output quirk: ':None' survives
    assert not is_excluded(0) and not is_excluded("0")


def test_fk_keys_parsing():
    assert fk_keys(3) == [3]
    assert fk_keys(3.0) == [3]
    assert fk_keys(" 1, 2,3 ") == [1, 2, 3]
    assert fk_keys("7") == [7]
    assert fk_keys(None) is None
    assert fk_keys("nan") is None
    with pytest.raises(ValueError):
        fk_keys("x,y")


def test_emitter_literals_fks_and_quarantine():
    spec = EmissionSpec(
        name="t",
        subject_template="{name}",
        subject_casing="PascalCase",
        rdf_type=":Thing",
        label_template="{name}",
        literals=(
            Literal(column="url", predicate=":seeAlso", kind="xsd:anyURI"),
            Literal(column="aliases", predicate="rdfs:label", kind="lang", split=","),
            Literal(column="equiv", predicate="rdfs:equivalentClass", kind="iri",
                    split=","),
        ),
        fks=(ForeignKey(column="ref_idx", predicate=":hasRef", lookup="refs"),),
    )
    batch = pa.table(
        {
            "name": ["my thing", None, "other"],
            "url": ["http://x.y/z", None, "nan"],
            "aliases": ["alias one , alias two", None, ""],
            "equiv": ["ICD9CM:1.2, some label", None, None],
            "ref_idx": ["0,1", None, "99"],  # 99 dangles
        }
    )
    emitter = TripleEmitter([spec], {"refs": {0: "Ref A", 1: "Ref B"}})
    got = _triples(emitter(batch))
    assert (":MyThing", "a", ":Thing") in got
    assert (":MyThing", "rdfs:label", '"""my thing"""@en') in got
    assert (":MyThing", ":seeAlso", '"http://x.y/z"^^xsd:anyURI') in got
    assert (":MyThing", "rdfs:label", '"""alias one"""@en') in got
    assert (":MyThing", "rdfs:label", '"""alias two"""@en') in got
    assert (":MyThing", "rdfs:equivalentClass", "ICD9CM:1.2") in got
    assert (":MyThing", "rdfs:equivalentClass", ":some_label") in got
    assert (":MyThing", ":hasRef", ":RefA") in got
    assert (":MyThing", ":hasRef", ":RefB") in got
    # dangling FK quarantined, not crashed
    assert (":Other", ":hasDanglingFK", '"ref_idx=99"^^xsd:string') in got
    # the None-subject row emitted nothing
    assert not [t for t in got if t[0] == ":None"]


def test_emitter_subject_truncation():
    long = "x" * 80
    spec = EmissionSpec(
        name="claims", subject_template="{c}", subject_casing="PascalCase",
        subject_truncate=50, rdf_type=":Claim",
    )
    got = _triples(TripleEmitter([spec])(pa.table({"c": [long]})))
    assert (":" + "X" + "x" * 49, "a", ":Claim") in got


def test_entity_linker_stage(ray_session):
    import ray
    import ray.data

    from mhdb_tables2turtles_ray.sources.vocab import language_vocab
    from mhdb_tables2turtles_ray.stages.linker import link_column

    ds = ray.data.from_items(
        [{"lang": "EN "}, {"lang": "fra"}, {"lang": "xx"}, {"lang": None}]
    )
    out = link_column(
        ds, ray.put(language_vocab()), "lang", unknown_value="UNKNOWN", concurrency=1
    ).to_pandas()
    assert list(out["canonical"]) == ["English", "French", "UNKNOWN", "UNKNOWN"]


def test_crosswalk_waterfall():
    from mhdb_tables2turtles_ray.sources.vocab import RELN_PREDICATES, crosswalk_tables
    from mhdb_tables2turtles_ray.stages.linker import CrosswalkResolver

    cw = crosswalk_tables()
    # id 25 exists in tasks (0-29) AND task_implementations (20-49):
    # priority order says tasks wins
    assert cw["union"][25][1] == "tasks"
    resolver = CrosswalkResolver(cw, RELN_PREDICATES)
    batch = pa.table(
        {
            "reln_type": ["KINDOF", "UNKNOWNTYPE", "ASSERTS"],
            "startNode": [25, 0, 999],
            "endNode": [40, 1, 0],
        }
    )
    got = _triples(resolver(batch))
    # 25→tasks name, PascalCase; 40→implementations name (40 not in tasks)
    assert (":TasksNode25", "rdfs:subClassOf", ":Task_ImplementationsNode40") in got
    # unknown reln dropped entirely
    assert not [t for t in got if ":TasksNode0" in t[0]]
    # dangling node quarantined
    assert any(p == ":hasDanglingFK" for (_, p, _) in got)


def test_enumerate_in_groups(ray_session):
    import ray.data

    from mhdb_tables2turtles_ray.stages.enumerate_groups import enumerate_in_groups

    rows = [
        {"q": "B", "ord": 2, "v": "b2"},
        {"q": "A", "ord": 10, "v": "a2"},
        {"q": "A", "ord": 1, "v": "a1"},
        {"q": "B", "ord": 1, "v": "b1"},
        {"q": "A", "ord": 30, "v": "a3"},
    ]
    out = (
        enumerate_in_groups(ray.data.from_items(rows).repartition(3), "q", ["ord"])
        .to_pandas()
        .sort_values(["q", "ordinal"])
    )
    assert list(out["v"]) == ["a1", "a2", "a3", "b1", "b2"]
    assert list(out["ordinal"]) == [1, 2, 3, 1, 2]


def test_used_prefixes(ray_session):
    import ray.data

    from mhdb_tables2turtles_ray.stages.prefixes import used_prefixes

    ds = ray.data.from_items(
        [
            {"subj": ":a", "pred": "rdfs:label", "obj": '"""x"""@en'},
            {"subj": "ICD9CM:1", "pred": "a", "obj": ":Thing"},
            {"subj": ":b", "pred": ":p", "obj": "<http://u.rl/x>"},
            {"subj": ":c", "pred": ":p", "obj": '"v"^^xsd:string'},
        ]
    )
    assert used_prefixes(ds) == ["ICD9CM", "rdfs"]


def test_emitter_whitespace_only_nonascii_subject_skipped():
    """A whitespace-only non-ASCII subject cell (U+00A0) must not crash
    the vectorized batch path; the row is skipped exactly as the scalar
    path skips it (empty after strip)."""
    spec = EmissionSpec(
        name="ws",
        subject_template="{name}",
        subject_casing="delimited",
        rdf_type=":Thing",
    )
    out = _triples(TripleEmitter([spec])(pa.table({"name": ["good row", "\u00a0"]})))
    assert out == {(":good_row", "a", ":Thing")}


def test_emitter_composed_excluded_subject_skipped():
    """A multi-field subject whose CONCATENATION equals an excluded
    sentinel ('Na'+'N' -> 'NaN') is skipped on the vectorized path just
    like the scalar path (which checks is_excluded after formatting)."""
    spec = EmissionSpec(
        name="cmp",
        subject_template="{a}{b}",
        subject_casing="delimited",
        rdf_type=":Thing",
    )
    out = _triples(
        TripleEmitter([spec])(pa.table({"a": ["Na", "x"], "b": ["N", "y"]}))
    )
    assert out == {(":xy", "a", ":Thing")}


def test_mention_scanner(ray_session):
    """In-content mention detection: exact-token alias hits counted per
    (row, entity), scored by non-empty token count; no-mention rows emit
    nothing; the Arrow path equals a straight Python oracle."""
    import pyarrow as pa
    import ray
    import ray.data

    from mhdb_tables2turtles_ray.stages.linker import scan_mentions

    alias = {"python": "Python", "py": "Python", "rust": "Rust", "go": "Go"}
    docs = [
        ("a", "Ported from Python to Rust; python wins"),   # python×2, rust×1
        ("b", "nothing to see here"),
        ("c", "go GO gO"),                                   # go×3 (case-folded)
        ("d", ""),
        ("e", "py.py;py"),                                   # separators split -> py×3
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc": pa.array([d for d, _ in docs], pa.string()),
                "content": pa.array([t for _, t in docs], pa.string()),
            }
        )
    ).repartition(2)
    out = scan_mentions(
        ds, ray.put({"alias": alias}), column="content", id_column="doc"
    ).to_pandas()
    got = {
        (r.doc, r.entity): (r.n_mentions, r.score) for r in out.itertuples()
    }

    import re

    expect = {}
    for doc, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9+#_]+", text.lower()) if t]
        for t in toks:
            if t in alias:
                k = (doc, alias[t])
                n = expect.get(k, (0, 0))[0] + 1
                expect[k] = (n, n / len(toks))
    assert got == expect
    assert ("b", "Python") not in got and not any(d == "d" for d, _ in got)


def test_literal_int_kinds_lossless_above_2_53():
    """xsd:int / xsd:nonNegativeInteger cells must not round-trip
    through float64: 2^53 + 1 renders exactly (round-5 review fix).
    Integer STRINGS take the lossless path too; float cells and float
    strings still truncate like the reference's int()."""
    big = (1 << 53) + 1  # 9007199254740993; float64 rounds it to ...992
    lit = Literal(column="n", predicate=":hasN", kind="xsd:int")
    assert lit.render(big) == [f'"{big}"^^xsd:int']
    assert lit.render(str(big)) == [f'"{big}"^^xsd:int']
    assert lit.render(2018.0) == ['"2018"^^xsd:int']
    assert lit.render("2018.0") == ['"2018"^^xsd:int']
