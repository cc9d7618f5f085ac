"""Declarative EmissionSpec config loading (reference structure_to_keep
semantics): a spec defined in a config file must produce byte-identical
triples to the same spec defined in code."""

from __future__ import annotations

import pyarrow as pa

from mhdb_tables2turtles_ray.pipelines.kg import corpus_specs
from mhdb_tables2turtles_ray.stages.emit import TripleEmitter
from mhdb_tables2turtles_ray.stages.spec_config import (
    dump_specs,
    load_specs,
    specs_from_rows,
    specs_from_table,
    specs_to_rows,
    specs_to_table,
)


def test_round_trip_rows():
    specs = corpus_specs()
    assert specs_from_rows(specs_to_rows(specs)) == specs


def test_round_trip_table():
    specs = corpus_specs()
    assert specs_from_table(specs_to_table(specs)) == specs


def test_round_trip_json_and_parquet(tmp_path):
    specs = corpus_specs()
    jpath = str(tmp_path / "specs.json")
    ppath = str(tmp_path / "specs.parquet")
    dump_specs(specs, jpath)
    dump_specs(specs, ppath)
    assert load_specs(jpath) == specs
    assert load_specs(ppath) == specs


def _triples(table):
    return set(
        zip(
            table.column("subj").to_pylist(),
            table.column("pred").to_pylist(),
            table.column("obj").to_pylist(),
        )
    )


def test_config_specs_emit_identical_triples(tmp_path):
    """e2e: the corpus emission rules loaded from a config file emit the
    exact triple set the coded registry emits."""
    path = str(tmp_path / "corpus_specs.json")
    dump_specs(corpus_specs(), path)
    loaded = load_specs(path)

    batch = pa.table(
        {
            "repo": ["org1/repoA", "org2/repo B"],
            "path": ["src/main_1.py", "Tools/0index_2.rs"],
            "commit": ["a" * 40, "b" * 40],
            "lang_canonical": ["Python", "Rust"],
            "content_sha256": ["c" * 64, "d" * 64],
        }
    )
    got = _triples(TripleEmitter(loaded)(batch))
    want = _triples(TripleEmitter(corpus_specs())(batch))
    assert got == want and len(want) > 0


def test_bad_configs_rejected():
    import pytest

    with pytest.raises(ValueError):
        specs_from_rows([{"spec": "x", "role": "mystery"}])
    with pytest.raises(ValueError):
        specs_from_rows([{"spec": "x", "role": "type", "value": ":T"}])  # no subject
    with pytest.raises(ValueError):
        specs_from_rows(
            [
                {"spec": "x", "role": "subject", "template": "{a}"},
                {"spec": "x", "role": "subject", "template": "{b}"},
            ]
        )


def test_kg_triples_raw_with_config_specs_identical(ray_session, tmp_path):
    """Full pipeline parity: kg_triples_raw driven by config-loaded specs
    produces the identical triple set to the coded registry."""
    from mhdb_tables2turtles_ray.pipelines.kg import kg_triples_raw
    from mhdb_tables2turtles_ray.sources.corpus import corpus_from_documents

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "specs.parquet")
    dump_specs(corpus_specs(), path)

    def tset(ds):
        return {(r["subj"], r["pred"], r["obj"]) for r in ds.take_all()}

    default = tset(kg_triples_raw(corpus_from_documents(sf)))
    configured = tset(
        kg_triples_raw(corpus_from_documents(sf), specs=load_specs(path))
    )
    assert configured == default and len(default) > 0


from hypothesis import given, settings
from hypothesis import strategies as st

from mhdb_tables2turtles_ray.stages.emit import EmissionSpec, ForeignKey, Literal

_IDENT = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
)
_CASING = st.sampled_from(["PascalCase", "camelCase", "delimited"])
_KIND = st.sampled_from(["lang", "iri", "raw", "xsd:string", "curie:ICD9CM"])


@st.composite
def _specs(draw):
    n_lits = draw(st.integers(0, 3))
    n_fks = draw(st.integers(0, 2))
    n_statics = draw(st.integers(0, 2))
    return EmissionSpec(
        name=draw(_IDENT),
        subject_template="{" + draw(_IDENT) + "}",
        subject_casing=draw(_CASING),
        subject_truncate=draw(st.one_of(st.none(), st.integers(1, 100))),
        rdf_type=draw(st.one_of(st.none(), st.just(":Thing"))),
        label_template=draw(st.one_of(st.none(), st.just("{name}"))),
        statics=tuple(
            (":p" + str(i), ":o" + str(i)) for i in range(n_statics)
        ),
        literals=tuple(
            Literal(
                column=draw(_IDENT),
                predicate=":lit" + str(i),
                kind=draw(_KIND),
                lang=draw(st.sampled_from(["en", "fr"])),
                casing=draw(_CASING),
                truncate=draw(st.one_of(st.none(), st.integers(1, 50))),
                split=draw(st.one_of(st.none(), st.just(","))),
                template=draw(st.one_of(st.none(), st.just("{a} {b}"))),
                strip=draw(st.booleans()),
            )
            for i in range(n_lits)
        ),
        fks=tuple(
            ForeignKey(
                column=draw(_IDENT),
                predicate=":fk" + str(i),
                lookup=draw(_IDENT),
                casing=draw(_CASING),
                as_literal=draw(st.one_of(st.none(), st.just("xsd:string"))),
                default=draw(st.one_of(st.none(), st.just(":Default"))),
                split_key_by=draw(st.one_of(st.none(), st.just("|"))),
                split_value_by=draw(st.one_of(st.none(), st.just(";"))),
                backup_lookup=draw(st.one_of(st.none(), st.just("bkp"))),
            )
            for i in range(n_fks)
        ),
    )


@settings(max_examples=50, deadline=None)
@given(st.lists(_specs(), min_size=1, max_size=4, unique_by=lambda s: s.name))
def test_arbitrary_specs_round_trip(specs):
    """Any spec expressible in the dataclasses survives rows → table →
    parquet → rows byte-identically."""
    specs = tuple(specs)
    assert specs_from_rows(specs_to_rows(specs)) == specs
    assert specs_from_table(specs_to_table(specs)) == specs


# --- J6 foreign() dual-delimiter surface (mhdb/unused_functions.py:417-535) --


def test_dual_delimiter_fk_through_config_table():
    """A spec with DISTINCT key and value delimiters (split_key_by='|',
    split_value_by=';') + a backup lookup, loaded from a config TABLE,
    reproduces the reference foreign() rule:
    keys = [int(float(x)) for x in str(cell).split(skb)], value split
    on svb, each piece minted; value None/'None' falls back to the
    backup column."""
    from mhdb_tables2turtles_ray.functions.strings import check_iri
    from mhdb_tables2turtles_ray.stages.emit import (
        EmissionSpec,
        ForeignKey,
    )

    spec = EmissionSpec(
        name="foreign_demo",
        subject_template="{name}",
        subject_casing="PascalCase",
        fks=(
            ForeignKey(
                column="refs",
                predicate=":points",
                lookup="primary",
                split_key_by="|",
                split_value_by=";",
                backup_lookup="backup",
            ),
        ),
    )
    # config-table round trip first (the structure_to_keep surface)
    loaded = specs_from_table(specs_to_table([spec]))
    assert loaded == (spec,)

    lookups = {
        # key 2's value is the string 'None' → backup kicks in;
        # key 3 is absent from primary → backup kicks in
        "primary": {1: "alpha;beta", 2: "None"},
        "backup": {2: "gamma", 3: "delta;eps"},
    }
    batch = pa.table({"name": ["row1"], "refs": ["1|2.0|3"]})
    out = TripleEmitter(loaded, lookups, quarantine=False)(batch)
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in out.to_pylist()
    }

    # straight-line replay of the reference rule
    expected = set()
    for fk in [int(float(x)) for x in "1|2.0|3".split("|")]:
        v = lookups["primary"].get(fk)
        if v is None or v == "None":
            v = lookups["backup"].get(fk, v)
        for piece in v.split(";"):
            expected.add(
                (check_iri("row1", "PascalCase"), ":points",
                 check_iri(piece, "PascalCase"))
            )
    assert got == expected
    assert (":Row1", ":points", ":Gamma") in got
    assert (":Row1", ":points", ":Eps") in got


def test_split_key_by_garbage_quarantines():
    from mhdb_tables2turtles_ray.stages.emit import (
        EmissionSpec,
        ForeignKey,
    )

    spec = EmissionSpec(
        name="g",
        subject_template="{name}",
        fks=(
            ForeignKey(
                column="refs", predicate=":p", lookup="primary",
                split_key_by="|",
            ),
        ),
    )
    batch = pa.table({"name": ["x"], "refs": ["1|oops"]})
    out = TripleEmitter([spec], {"primary": {1: "a"}})(batch)
    triples = {(r["pred"], r["obj"]) for r in out.to_pylist()}
    # reference int(float('oops')) raises; we quarantine the whole cell
    assert (":hasDanglingFK", '"refs=1|oops"^^xsd:string') in triples
