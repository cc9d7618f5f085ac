"""Persisted inverted index + partition-pruned BM25 probe: equality
with the scan-side scorer, real I/O pruning (non-probed partitions can
vanish without affecting a probe; probed ones fail loudly), resumable
build, and structural-param pinning."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from mhdb_tables2turtles_ray.pipelines.lexindex import (
    bm25_probe,
    build_text_index,
)
from mhdb_tables2turtles_ray.pipelines.text import bm25_score

QUERY = "hash join scan"
P = 8


@pytest.fixture(scope="module")
def index(ray_session, sf_small, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lexidx"))
    stats = build_text_index(sf_small, d, num_partitions=P)
    return d, stats


def _df(ds) -> pd.DataFrame:
    return (
        pd.DataFrame(ds.take_all()).sort_values("doc_id").reset_index(drop=True)
    )


def test_probe_matches_scan_scorer(index, sf_small):
    d, stats = index
    assert stats["n_docs"] == 500
    got = _df(bm25_probe(d, QUERY))
    ref = _df(bm25_score(sf_small, QUERY))
    assert list(got["doc_id"]) == list(ref["doc_id"]) and len(got) > 0
    # same Lucene idf + 6-decimal half-away rounding; summation order
    # may differ across engines, hence the 1e-9 guard
    assert np.allclose(got["score"], ref["score"], atol=1e-9)


def test_probe_with_absent_term_matches(index, sf_small):
    d, _ = index
    q = QUERY + " zzzznotaterm"
    got = _df(bm25_probe(d, q))
    ref = _df(bm25_score(sf_small, q))
    assert list(got["doc_id"]) == list(ref["doc_id"])
    assert np.allclose(got["score"], ref["score"], atol=1e-9)


def test_probe_prunes_io(index, tmp_path):
    """Deleting every partition the query does NOT hash to leaves the
    probe untouched — proof the read never opens them; deleting a
    probed partition's manifest raises instead of degrading."""
    from mhdb_tables2turtles_ray.stages.semijoin import hash_strings

    d, _ = index
    work = str(tmp_path / "pruned")
    shutil.copytree(d, work)
    terms = np.asarray(sorted(set(QUERY.split())), dtype=object)
    probed = set((hash_strings(terms) % P).tolist())
    assert len(probed) < P
    before = _df(bm25_probe(work, QUERY))
    for p in set(range(P)) - probed:
        os.unlink(os.path.join(work, f"part-{p:05d}.parquet"))
    after = _df(bm25_probe(work, QUERY))
    pd.testing.assert_frame_equal(before, after)

    victim = sorted(probed)[0]
    os.unlink(os.path.join(work, "_manifests", f"part-{victim:05d}.json"))
    with pytest.raises(ValueError, match="missing/corrupt"):
        bm25_probe(work, QUERY)


def test_build_is_resumable_and_pinned(index, sf_small):
    d, stats = index
    again = build_text_index(sf_small, d, num_partitions=P)
    assert again == stats
    with pytest.raises(ValueError, match="different parameters"):
        build_text_index(sf_small, d, num_partitions=P * 2)


def test_probe_validation(index, tmp_path):
    d, _ = index
    with pytest.raises(ValueError, match="no terms"):
        bm25_probe(d, "   ")
    with pytest.raises(ValueError, match="build it first"):
        bm25_probe(str(tmp_path / "nope"), QUERY)
    bad = str(tmp_path / "badkind")
    os.makedirs(bad)
    with open(os.path.join(bad, "_index_meta.json"), "w") as f:
        json.dump({"kind": "ivf_clustered", "num_partitions": P}, f)
    with pytest.raises(ValueError, match="not a bm25_inverted"):
        bm25_probe(bad, QUERY)


def test_all_query_terms_absent(index):
    d, _ = index
    assert bm25_probe(d, "zzzznotaterm qqqqalsonot").count() == 0
