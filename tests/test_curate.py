"""End-to-end curation funnel: stage consistency and survivor properties."""

from __future__ import annotations

import hashlib


def test_curate_corpus_funnel(ray_session):
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus
    from mhdb_tables2turtles_ray.pipelines.dedup import minhash_lsh_pairs

    sf = "/root/testdata/sf0.001"
    survivors_ds, funnel = curate_corpus(sf, langs=("en", "de", "fr"))
    survivors = {r["doc_id"] for r in survivors_ds.take_all()}

    # funnel is monotone non-increasing and consistent with the result
    assert (
        funnel["input"]
        >= funnel["after_quality_lang"]
        >= funnel["after_exact_dedup"]
        >= funnel["after_near_dedup"]
        == len(survivors)
        > 0
    )

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    by_id = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))

    # every survivor passes the length filter
    assert all(len((by_id[d] or "").split()) >= 5 for d in survivors)
    # no two survivors share exact content
    digests = [hashlib.md5(by_id[d].encode()).hexdigest() for d in survivors]
    assert len(digests) == len(set(digests))
    # no LSH near-dup pair has BOTH endpoints surviving (pairs over the
    # full corpus are a superset of pairs over any subset)
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(sf).take_all()
    ]
    assert not any(a in survivors and b in survivors for a, b in pairs)


def test_curate_corpus_language_filter(ray_session):
    """Restricting langs shrinks (or keeps equal) the first funnel stage."""
    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    _, all_langs = curate_corpus(sf, langs=("en", "de", "fr"))
    _, en_only = curate_corpus(sf, langs=("en",))
    assert en_only["after_quality_lang"] <= all_langs["after_quality_lang"]
    assert en_only["after_near_dedup"] <= all_langs["after_near_dedup"]
