"""Unit tests for the reference-parity extras: response-option Seqs,
reification, name composition, two-hop lookup, salted aggregation,
provenance split, turtle validation."""

from __future__ import annotations

import pyarrow as pa
import pytest

from mhdb_tables2turtles_ray.functions.compose import Part, compose_entity_name, icd_curie
from mhdb_tables2turtles_ray.stages.reify import statement_bnode
from mhdb_tables2turtles_ray.stages.seq import SeqEmitter, parse_response_options


def _triples(table):
    return set(
        zip(
            table.column("subj").to_pylist(),
            table.column("pred").to_pylist(),
            table.column("obj").to_pylist(),
        )
    )


def test_parse_response_options_quoted():
    # reference regex branch (mhdb/ingest.py:2203-2205)
    seq_iri, responses = parse_response_options('-1="never", 2="sometimes", 3="often"')
    assert responses == ['"never"', '"sometimes"', '"often"']
    assert seq_iri.startswith(":")


def test_parse_response_options_comma():
    seq_iri, responses = parse_response_options("1=no, 2=yes")
    assert responses == ["no", "2=yes".split("=")[1]]
    _, bad = parse_response_options("yes,no")  # no '=' → quarantined, not crash
    assert bad == [None, None]


def test_seq_emitter_membership_skips_excluded():
    batch = pa.table(
        {
            "question_iri": [":Q1", ":Q2"],
            "opts": ['1="a", 2="", 3="c"', None],
        }
    )
    got = _triples(SeqEmitter("question_iri", "opts")(batch))
    seq_subjects = {s for (s, p, o) in got if p == "a" and o == "rdf:Seq"}
    assert len(seq_subjects) == 1
    seq = next(iter(seq_subjects))
    assert (":Q1", ":hasResponseOptions", seq) in got
    members = {p for (s, p, o) in got if s == seq and p.startswith("rdf:_")}
    # '""' response strips to '""' → check_iri('""') is minted, not excluded;
    # reference only skips values in the exclude list
    assert "rdf:_1" in members and "rdf:_3" in members


def test_compose_entity_name_reference_patterns():
    # patterns from mhdb/ingest.py:655-736
    label, iri_label, iri = compose_entity_name(
        "Anxiety",
        [
            Part("ICD9CM", "300.02", style="code", iri_tag="ICD9"),
            Part("specifier", "generalized"),
            Part("inclusion", "excessive worry"),
            Part("", "restlessness", style="continuation"),
        ],
    )
    assert label == (
        "Anxiety; ICD9CM:300.02; specifier: generalized; "
        "inclusion: excessive worry, restlessness"
    )
    assert iri_label == (
        "Anxiety ICD9 300.02 specifier generalized inclusion excessive worry restlessness"
    )
    assert iri.startswith(":Anxiety")
    assert icd_curie(9, "300.02") == "ICD9CM:300.02"
    assert icd_curie(10, "F41.1") == "ICD10CM:F41.1"


def test_statement_bnode():
    assert statement_bnode(":Doc_1", "a", ":Document") == "_:Doc_1_a_Document"
    assert statement_bnode(":D", "rdfs:label", '"""x"""@en') == "_:D_rdfslabel_xen"


def test_two_hop_lookup(ray_session):
    import ray
    import ray.data

    from mhdb_tables2turtles_ray.stages.twohop import two_hop_lookup

    ds = ray.data.from_items([{"k": 1}, {"k": 2}, {"k": 99}])
    out = (
        two_hop_lookup(
            ds, "k", ray.put({1: "a", 2: "b"}), ray.put({"a": "X", "b": "Y"}), "v"
        )
        .to_pandas()
        .sort_values("k")
    )
    assert list(out["v"]) == ["X", "Y", None]


def test_salted_count_equals_plain_count(ray_session):
    import ray.data
    from ray.data.aggregate import Count

    from mhdb_tables2turtles_ray.stages.salted import salted_group_count

    # one hot key (80%) + tail
    rows = [{"subj": ":hot"}] * 400 + [{"subj": f":s{i}"} for i in range(100)]
    ds = ray.data.from_items(rows).repartition(8)
    salted = {
        (r["subj"], r["degree"])
        for r in salted_group_count(ds, "subj", num_salts=4).take_all()
    }
    plain = {
        (r["subj"], r["count()"])
        for r in ds.groupby("subj").aggregate(Count()).take_all()
    }
    assert salted == plain
    assert (":hot", 400) in salted


def test_flag_sourced(ray_session):
    import ray.data

    from mhdb_tables2turtles_ray.stages.provenance import flag_sourced

    rows = [
        {"subj": ":a", "pred": "rdfs:label", "obj": '"""a"""@en'},
        {"subj": ":a", "pred": "dcterms:isReferencedBy", "obj": ":ref1"},
        {"subj": ":b", "pred": "rdfs:label", "obj": '"""b"""@en'},
    ]
    out = flag_sourced(ray.data.from_items(rows)).to_pandas()
    by_subj = out.groupby("subj")["sourced"].all()
    assert bool(by_subj[":a"]) is True
    assert bool(by_subj[":b"]) is False


def test_validate_turtle_dir(ray_session, tmp_path):
    from mhdb_tables2turtles_ray.pipelines.kg import kg_build
    from mhdb_tables2turtles_ray.sources.corpus import corpus_from_documents
    from mhdb_tables2turtles_ray.stages.validate import validate_turtle_dir

    out_dir = str(tmp_path / "ttl")
    summary = kg_build(
        corpus_from_documents("/root/testdata/sf0.001"), out_dir, num_partitions=4
    )
    report = validate_turtle_dir(out_dir)
    assert report["shards"] == len(summary["written"])
    assert report["triples"] == summary["n_triples"]

    # corrupt one shard → validation must fail
    shard = out_dir + "/part-00001.ttl"
    with open(shard, "a") as f:
        f.write("garbage")
    with pytest.raises(ValueError):
        validate_turtle_dir(out_dir)

def test_consolidated_monitoring_queries(ray_session):
    """The registry's consolidated monitoring unions carry exactly their
    member queries' rows: sketch_pairs = minhash ∪ simhash (scores
    preserved); ann_variants = 4 search variants + kmeans_stats with the
    correct null pattern per variant."""
    from mhdb_tables2turtles_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
        sketch_pairs,
    )
    from mhdb_tables2turtles_ray.pipelines.similarity import ann_variants

    sf = "/root/testdata/sf0.001"
    sp = sketch_pairs(sf).to_pandas()
    mh = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(sf).take_all()
    }
    sh = {
        (r["doc_a"], r["doc_b"]): float(r["hamming"])
        for r in simhash_pairs(sf).take_all()
    }
    got_mh = {
        (r.doc_a, r.doc_b): r.score
        for r in sp[sp.variant == "minhash_lsh"].itertuples()
    }
    got_sh = {
        (r.doc_a, r.doc_b): r.score
        for r in sp[sp.variant == "simhash"].itertuples()
    }
    assert got_mh == mh and got_sh == sh
    # embed_lsh variant present with SRP-estimated cosine scores
    el = sp[sp.variant == "embed_lsh"]
    assert ((el.score >= -1.0) & (el.score <= 1.0)).all()

    av = ann_variants(sf).to_pandas()
    assert set(av.variant.unique()) == {
        "ivf", "ivf_kmeans", "ivf_partitioned", "quantized", "kmeans_stats",
    }
    search = av[av.variant != "kmeans_stats"]
    stats = av[av.variant == "kmeans_stats"]
    assert search["query_id"].notna().all() and search["cluster"].isna().all()
    assert stats["cluster"].notna().all() and stats["query_id"].isna().all()
    # the trained compute-pruned and I/O-pruned variants agree exactly
    cols = ["query_id", "neighbor_id", "rank", "cosine"]
    a = search[search.variant == "ivf_kmeans"][cols].sort_values(cols).reset_index(drop=True)
    b = search[search.variant == "ivf_partitioned"][cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)

def test_materialize_turtle_split_two_way(ray_session, tmp_path):
    """Sourced/unsourced two-way materialize (structure_to_keep writes
    separate outputs, reference mhdb/unused_functions.py:611-749): each
    side gets its own shards + manifests, the union of parsed sides is
    the full triple set partitioned by the subject's provenance flag,
    and each side resumes independently."""
    import ray.data

    from mhdb_tables2turtles_ray.stages.materialize import (
        materialize_turtle_split,
    )
    from mhdb_tables2turtles_ray.stages.validate import validate_turtle_dir

    rows = [
        {"subj": ":a", "pred": "rdfs:label", "obj": '"""a"""@en'},
        {"subj": ":a", "pred": "dcterms:isReferencedBy", "obj": ":ref1"},
        {"subj": ":a", "pred": ":hasX", "obj": ":x"},
        {"subj": ":b", "pred": "rdfs:label", "obj": '"""b"""@en'},
        {"subj": ":c", "pred": "rdfs:label", "obj": '"""c"""@en'},
        {"subj": ":c", "pred": "dcterms:isReferencedBy", "obj": ":ref2"},
    ]
    out_root = str(tmp_path / "split")
    summaries = materialize_turtle_split(
        ray.data.from_items(rows), out_root, num_partitions=2
    )
    assert summaries["sourced"]["n_triples"] == 5
    assert summaries["unsourced"]["n_triples"] == 1
    for name in ("sourced", "unsourced"):
        report = validate_turtle_dir(f"{out_root}/{name}")
        assert report["triples"] == summaries[name]["n_triples"]

    from tests.golden_ttl import parse_triples

    def side_triples(name):
        import os

        text = ""
        d = f"{out_root}/{name}"
        for f in sorted(os.listdir(d)):
            if f.endswith(".ttl") and f != "header.ttl":
                text += "\n\n" + open(os.path.join(d, f)).read()
        return parse_triples(text)

    sourced, unsourced = side_triples("sourced"), side_triples("unsourced")
    assert {s for s, _, _ in sourced} == {":a", ":c"}
    assert {s for s, _, _ in unsourced} == {":b"}
    assert len(sourced | unsourced) == len(rows)

    # resume: a second run skips every finished partition on both sides
    again = materialize_turtle_split(
        ray.data.from_items(rows), out_root, num_partitions=2
    )
    for name in ("sourced", "unsourced"):
        assert again[name]["written"] == []
        assert sorted(again[name]["skipped"]) == sorted(
            summaries[name]["written"] + summaries[name]["skipped"]
        )
