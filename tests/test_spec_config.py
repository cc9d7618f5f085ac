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
