"""Synthetic corpus generator properties + resume edge cases + skew."""

from __future__ import annotations

import json
import os


def _df(ds):
    return ds.to_pandas().sort_values(["commit"]).reset_index(drop=True)


def test_synthesize_corpus_deterministic(ray_session):
    from mhdb_tables2turtles_ray.sources.corpus import synthesize_corpus

    a = _df(synthesize_corpus(2000, dup_fraction=0.01))
    b = _df(synthesize_corpus(2000, dup_fraction=0.01))
    assert a.equals(b)
    assert list(a.columns) == ["repo", "path", "commit", "lang", "content"]
    # dup_fraction produces exact duplicate contents
    assert a["content"].duplicated().sum() > 0


def test_synthesize_corpus_skew(ray_session):
    from mhdb_tables2turtles_ray.sources.corpus import synthesize_corpus

    ds = synthesize_corpus(3000, skew_repo_fraction=0.3, dup_fraction=0.0)
    counts = ds.to_pandas()["repo"].value_counts()
    assert counts.iloc[0] > 0.25 * 3000
    assert counts.index[0] == "org0/hot-repo"


def test_skewed_corpus_through_kg(ray_session):
    """The full pipeline survives a corpus where one repo holds 30% of
    rows (hot subject for the repo triples) — the dedup shuffle keys on
    the triple hash so the hot repo cannot overload one reducer."""
    from mhdb_tables2turtles_ray.pipelines.kg import kg_triples
    from mhdb_tables2turtles_ray.sources.corpus import synthesize_corpus

    ds = synthesize_corpus(2000, skew_repo_fraction=0.3)
    triples = kg_triples(ds, dedup_buckets=8)
    n = triples.count()
    assert n > 2000
    # hot repo collapsed to exactly one (subj, a, :Repository) triple
    hot = [
        r
        for r in triples.take_all()
        if r["subj"] == ":org0hot-repo" and r["pred"] == "a"
    ]
    assert hot == [{"subj": ":org0hot-repo", "pred": "a", "obj": ":Repository"}]


def test_wide_records_stream(ray_session):
    """Multi-KB content payloads stream through the full pipeline —
    blocks stay bounded, no driver materialization (FIXTURES.md §A
    wide-record path)."""
    from mhdb_tables2turtles_ray.pipelines.kg import kg_triples
    from mhdb_tables2turtles_ray.sources.corpus import synthesize_corpus

    ds = synthesize_corpus(500, payload_repeat=60)  # ~6-12 KB rows
    sample = ds.take(3)
    assert all(len(r["content"]) > 4000 for r in sample)
    n = kg_triples(ds, dedup_buckets=8).count()
    assert n > 500


def test_resume_ignores_partial_writes(ray_session, tmp_path):
    """A data file without a valid manifest (killed mid-write) must be
    treated as pending and rebuilt."""
    from mhdb_tables2turtles_ray.pipelines.kg import kg_build
    from mhdb_tables2turtles_ray.sources.corpus import corpus_from_documents
    from mhdb_tables2turtles_ray.state.manifest import completed_partitions

    out_dir = str(tmp_path / "ttl")
    summary = kg_build(
        corpus_from_documents("/root/testdata/sf0.001"), out_dir, num_partitions=4
    )
    pid = summary["written"][0]

    # case 1: stale tmp file left behind → harmless
    open(os.path.join(out_dir, f"part-{pid:05d}.ttl.tmp.999"), "w").write("junk")
    assert pid in completed_partitions(out_dir, 4)

    # case 2: manifest corrupted → partition pending again
    mpath = os.path.join(out_dir, "_manifests", f"part-{pid:05d}.json")
    open(mpath, "w").write("{not json")
    assert pid not in completed_partitions(out_dir, 4)

    # case 3: data rewritten by hand (sha mismatch) → pending
    summary2 = kg_build(
        corpus_from_documents("/root/testdata/sf0.001"), out_dir, num_partitions=4
    )
    assert pid in summary2["written"]
    meta = json.load(open(mpath))
    assert meta["sha256"]
    open(os.path.join(out_dir, f"part-{pid:05d}.ttl"), "a").write("x")
    assert pid not in completed_partitions(out_dir, 4)


def test_read_turtle_dir_round_trip(ray_session, tmp_path):
    """Materialize → read_turtle_dir recovers EXACTLY the pipeline's
    deduplicated triple set; corrupted shards are skipped (or raise in
    strict mode)."""
    import pytest

    from mhdb_tables2turtles_ray.pipelines.kg import kg_build, kg_triples
    from mhdb_tables2turtles_ray.sources.corpus import corpus_from_documents
    from mhdb_tables2turtles_ray.sources.turtle import read_turtle_dir

    out = str(tmp_path / "rt")
    summary = kg_build(
        corpus_from_documents("/root/testdata/sf0.001"), out, num_partitions=6
    )
    back = {
        (r["subj"], r["pred"], r["obj"])
        for r in read_turtle_dir(out).take_all()
    }
    expect = {
        (r["subj"], r["pred"], r["obj"])
        for r in kg_triples(
            corpus_from_documents("/root/testdata/sf0.001")
        ).take_all()
    }
    assert back == expect and len(back) == summary["n_triples"]

    # corrupt one shard: default read skips it, strict raises
    import os

    victim = os.path.join(out, f"part-{summary['written'][0]:05d}.ttl")
    with open(victim, "a") as f:
        f.write("\ngarbage")
    partial = read_turtle_dir(out).count()
    assert partial < len(expect)
    with pytest.raises(ValueError, match="manifest validation"):
        read_turtle_dir(out, strict=True)

    # a DELETED shard (manifest left behind) must also fail strict mode
    victim2 = os.path.join(out, f"part-{summary['written'][1]:05d}.ttl")
    os.remove(victim2)
    with pytest.raises(ValueError, match="manifest validation"):
        read_turtle_dir(out, strict=True)
    with pytest.raises(ValueError, match="manifest validation"):
        read_turtle_dir(out, num_partitions=6, strict=True)


def test_parse_turtle_blocks_tolerates_trailing_newline():
    """A POSIX-text tool appending a final newline must not make the last
    block 'malformed' — the parser strips trailing newlines per block."""
    from mhdb_tables2turtles_ray.sources.turtle import parse_turtle_blocks

    text = ":s1 :p1 :o1 .\n\n:s2 :p2 :o2 ."
    base = parse_turtle_blocks(text)
    with_nl = parse_turtle_blocks(text + "\n")
    assert base.equals(with_nl)
    assert base.num_rows == 2
