"""Corpus-trained bigram-LM perplexity scoring (pipelines/lm.py):
exact equality vs a pure-Python reference on the real corpus, the
smoothed unseen-token floor, and the edge/validation contract."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _ref_tables(texts):
    big, ctx, vocab = Counter(), Counter(), set()
    for t in texts:
        ws = [w.lower() for w in (t or "").split()]
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    return big, ctx, len(vocab)


def _ref_ppl(text, big, ctx, V, alpha=0.1):
    ws = [w.lower() for w in (text or "").split()]
    n = max(len(ws) - 1, 0)
    if n == 0:
        return n, None
    s = sum(
        math.log((big[(a, b)] + alpha) / (ctx[a] + alpha * V))
        for a, b in zip(ws, ws[1:])
    )
    return n, math.exp(-s / n)


def test_self_scored_matches_reference_on_real_corpus(ray_session):
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.lm import score_perplexity

    out = score_perplexity(SF).to_pandas().set_index("doc_id")
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    big, ctx, V = _ref_tables(texts.values())
    assert len(out) == len(texts)
    for d, text in texts.items():
        n, ref = _ref_ppl(text, big, ctx, V)
        row = out.loc[d]
        assert int(row["n_bigrams"]) == n
        if ref is None:
            assert np.isnan(row["ppl"])
        else:
            assert row["ppl"] == pytest.approx(ref, rel=1e-9)


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)


def test_unseen_corpus_hits_smoothed_floor(ray_session):
    """Scoring docs the LM never saw: an all-unseen-token doc scores
    exactly ppl = V (every bigram falls to the a/(a*V) = 1/V floor)."""
    from mhdb_tables2turtles_ray.pipelines.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    lm = train_bigram_lm(None, ds=_docs_ds(["aa bb cc aa bb", "bb cc aa"]))
    assert lm["vocab_size"] == 3
    out = (
        score_perplexity(None, lm=lm, ds=_docs_ds(["zz yy xx ww"]))
        .to_pandas()
        .iloc[0]
    )
    assert int(out["n_bigrams"]) == 3
    assert out["ppl"] == pytest.approx(3.0, rel=1e-12)


def test_repetitive_doc_scores_lower_than_rare_sequence(ray_session):
    from mhdb_tables2turtles_ray.pipelines.lm import score_perplexity

    corpus = ["the cat sat"] * 8 + ["dog ran far home deep blue"]
    out = (
        score_perplexity(None, ds=_docs_ds(corpus))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.iloc[0]["ppl"] < out.iloc[-1]["ppl"]


def test_short_and_null_docs_have_no_bigrams(ray_session):
    from mhdb_tables2turtles_ray.pipelines.lm import score_perplexity

    out = (
        score_perplexity(None, ds=_docs_ds(["one", "", None, "two words"]))
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(out) == 4
    for d in (0, 1, 2):
        assert int(out.loc[d, "n_bigrams"]) == 0
        assert np.isnan(out.loc[d, "ppl"])
    assert int(out.loc[3, "n_bigrams"]) == 1


def test_alpha_validation(ray_session):
    from mhdb_tables2turtles_ray.pipelines.lm import score_perplexity

    with pytest.raises(ValueError, match="alpha"):
        score_perplexity(None, alpha=0.0, ds=_docs_ds(["a b"]))
