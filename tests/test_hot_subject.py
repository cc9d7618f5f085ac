"""Hot-subject (high-degree entity) behavior: reverse-edge emission
creates a subject carrying a large fraction of all triples; the build
must stay correct and bounded (north-rule skew scenario)."""

from __future__ import annotations

import json
import os


def test_reverse_edges_and_hot_subject_build(ray_session, tmp_path):
    from mhdb_tables2turtles_ray.sources.corpus import synthesize_corpus
    from mhdb_tables2turtles_ray.stages.dedup import dedup_triples
    from mhdb_tables2turtles_ray.stages.emit import EmissionSpec, Literal, emit_triples
    from mhdb_tables2turtles_ray.stages.materialize import materialize_turtle

    # repo → :hasFile <file> reverse edges (reference's task→implementation
    # reverse-triple pattern); 30% of rows share one repo → one subject
    # holds ~30% of all reverse edges.
    reverse_spec = EmissionSpec(
        name="repo_files",
        subject_template="{repo}",
        subject_casing="delimited",
        rdf_type=":Repository",
        literals=(
            Literal(
                column="",
                predicate=":hasFile",
                kind="iri",
                template="{repo} {path}",
            ),
        ),
    )
    corpus = synthesize_corpus(5000, skew_repo_fraction=0.3, dup_fraction=0.0)
    triples = dedup_triples(emit_triples(corpus, [reverse_spec]), num_buckets=16)

    out_dir = str(tmp_path / "hot")
    summary = materialize_turtle(triples, out_dir, num_partitions=8, dedup=True)

    hot_edges = 0
    for f in os.listdir(os.path.join(out_dir, "_manifests")):
        meta = json.load(open(os.path.join(out_dir, "_manifests", f)))
        assert meta["n_triples"] > 0
    # the hot subject's block lives wholly in ONE shard (subject-hash
    # partitioning co-locates it); count its edges from the shards
    import re

    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".ttl") or f == "header.ttl":
            continue
        text = open(os.path.join(out_dir, f)).read()
        for block in text.split("\n\n"):
            if block.startswith(":org0hot-repo "):
                hot_edges += block.count(":hasFile")
    assert hot_edges >= 0.25 * 5000, hot_edges
    assert summary["n_triples"] > 5000


def test_quarantine_rate_threshold(ray_session, tmp_path):
    """Dangling FKs are quarantined, counted in manifests, and the rate
    is bounded — the threshold gate SURVEY §7.4 prescribes instead of
    the reference's IndexError crash."""
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.stages.emit import (
        EmissionSpec,
        ForeignKey,
        emit_triples,
    )
    from mhdb_tables2turtles_ray.stages.materialize import materialize_turtle

    n = 2000
    table = pa.table(
        {
            "name": [f"thing {i}" for i in range(n)],
            # ~10% of FK cells dangle (lookup has keys 0..89)
            "ref_idx": [str(i % 100) for i in range(n)],
        }
    )
    spec = EmissionSpec(
        name="things",
        subject_template="{name}",
        subject_casing="PascalCase",
        rdf_type=":Thing",
        fks=(ForeignKey(column="ref_idx", predicate=":hasRef", lookup="refs"),),
    )
    lookup = {"refs": {i: f"Ref {i}" for i in range(90)}}
    triples = emit_triples(ray.data.from_arrow(table), [spec], lookup)
    out_dir = str(tmp_path / "q")
    summary = materialize_turtle(triples, out_dir, num_partitions=4, dedup=True)

    quarantined = total = 0
    for f in os.listdir(os.path.join(out_dir, "_manifests")):
        meta = json.load(open(os.path.join(out_dir, "_manifests", f)))
        quarantined += meta["n_quarantined"]
        total += meta["n_triples"]
    assert quarantined == 200  # exactly the 10% dangling keys, counted
    rate = quarantined / total
    assert rate < 0.1, rate  # threshold gate
