"""Substring-level (duplicate-span) dedup: planted-span semantics,
merge rules, DuckDB equality on the real corpus, strip/span coherence,
and the Bloom path's over-removal-only guarantee."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from mhdb_tables2turtles_ray.pipelines.dedup import (
    duplicate_spans,
    strip_duplicate_spans,
)

W = 6
SHARED = "alpha beta gamma delta epsilon zeta"  # exactly W tokens


def _planted_ds():
    import ray.data

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"u1 one two {SHARED} tail1 tail2",
                # two occurrences in ONE doc (within-doc repetition
                # counts toward min_count) — second is upper-case
                f"s2 {SHARED} mid2 {SHARED.upper()} e2",
                "totally different content with no duplicated windows at all",
                None,  # null text must flow through as zero tokens
            ],
        }
    )
    return ray.data.from_pandas(docs)


def test_planted_spans_and_strip(ray_session):
    sp = (
        pd.DataFrame(duplicate_spans(None, window=W, ds=_planted_ds()).take_all())
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    expected = pd.DataFrame(
        {
            "doc_id": [1, 2, 2],
            "span_start": [3, 1, 8],
            "span_end": [9, 7, 14],
            "n_windows": [1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(sp, expected)

    st = (
        pd.DataFrame(
            strip_duplicate_spans(None, window=W, ds=_planted_ds()).take_all()
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(st["text"]) == [
        "u1 one two tail1 tail2",
        "s2 mid2 e2",
        "totally different content with no duplicated windows at all",
        "",
    ]
    assert list(st["n_tokens_removed"]) == [W, 2 * W, 0, 0]


def test_long_passage_merges_into_one_span(ray_session):
    import ray.data

    passage = " ".join(f"p{i}" for i in range(10))  # 10 tokens, W=6
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [f"a b {passage}", f"{passage} x y z"],
            }
        )
    )
    sp = (
        pd.DataFrame(duplicate_spans(None, window=W, ds=ds).take_all())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every 6-window of the 10-token passage repeats -> ONE merged span
    # of 10 tokens covering 10-6+1 = 5 windows, in each doc
    assert list(sp["doc_id"]) == [1, 2]
    assert list(sp["span_start"]) == [2, 0]
    assert list(sp["span_end"]) == [12, 10]
    assert list(sp["n_windows"]) == [5, 5]


def test_min_count_threshold(ray_session):
    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [f"x {SHARED}", f"y {SHARED}", f"z {SHARED}"],
            }
        )
    )
    assert duplicate_spans(None, window=W, min_count=3, ds=ds).count() == 3
    assert duplicate_spans(None, window=W, min_count=4, ds=ds).count() == 0


def test_spans_match_duckdb_oracle(ray_session, sf_small):
    """Engine spans == a straight-SQL replay of the definition (gram
    group-by on the STRINGS — no hashing — then window-merge) over the
    real sf documents table."""
    w = 8
    ours = (
        pd.DataFrame(duplicate_spans(sf_small, window=w).take_all())
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    oracle = con.execute(
        rf"""
        WITH tok AS (
          SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ts
          FROM documents
        ),
        w AS (
          SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
                 array_to_string(ts[i:i+{w - 1}], ' ') AS g
          FROM tok, unnest(range(1, len(ts) - {w - 2})) AS t(i)
        ),
        dup AS (SELECT g FROM w GROUP BY g HAVING count(*) >= 2),
        hits AS (SELECT doc_id, s FROM w WHERE g IN (SELECT g FROM dup)),
        b AS (
          SELECT doc_id, s,
                 CASE WHEN s > coalesce(max(s) OVER (
                          PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        ), -{w}) + {w} THEN 1 ELSE 0 END AS brk
          FROM hits
        ),
        g2 AS (
          SELECT doc_id, s,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid
          FROM b
        )
        SELECT doc_id, min(s) AS span_start,
               max(s) + {w} AS span_end,
               CAST(count(*) AS BIGINT) AS n_windows
        FROM g2 GROUP BY doc_id, gid
        ORDER BY doc_id, span_start
        """
    ).fetchdf()
    assert len(ours) > 0, "sf corpus should contain duplicated 8-grams"
    pd.testing.assert_frame_equal(
        ours, oracle, check_exact=True, check_dtype=False
    )


def test_strip_coheres_with_spans(ray_session, sf_small):
    """Token accounting: per doc, n_tokens_removed == total span length,
    and the stripped text is exactly the uncovered tokens in order."""
    w = 8
    sp = pd.DataFrame(duplicate_spans(sf_small, window=w).take_all())
    st = pd.DataFrame(strip_duplicate_spans(sf_small, window=w).take_all())
    removed = (
        (sp["span_end"] - sp["span_start"]).groupby(sp["doc_id"]).sum()
    )
    got = st.set_index("doc_id")["n_tokens_removed"]
    assert got[got > 0].to_dict() == removed.to_dict()

    # reconstruct a few stripped docs from the original + spans
    import pyarrow.parquet as pq

    docs = (
        pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")
    )
    spans_by_doc = {
        d: list(zip(g["span_start"], g["span_end"]))
        for d, g in sp.groupby("doc_id")
    }
    checked = 0
    for _, row in st.iterrows():
        if row["n_tokens_removed"] == 0 or checked >= 20:
            continue
        toks = docs.loc[row["doc_id"], "text"].split()
        keep = [
            t
            for i, t in enumerate(toks)
            if not any(a <= i < b for a, b in spans_by_doc[row["doc_id"]])
        ]
        assert row["text"] == " ".join(keep)
        checked += 1
    assert checked > 0


def test_bloom_path_only_over_removes(ray_session, sf_small):
    """Forcing the Bloom filter (exact_threshold=0) may mark extra
    windows (false positives) but NEVER misses a truly duplicated one:
    exact spans are covered by bloom spans."""
    w = 8
    exact = pd.DataFrame(duplicate_spans(sf_small, window=w).take_all())
    bloom = pd.DataFrame(
        duplicate_spans(sf_small, window=w, exact_threshold=0).take_all()
    )
    biv = {
        d: list(zip(g["span_start"], g["span_end"]))
        for d, g in bloom.groupby("doc_id")
    }
    for _, r in exact.iterrows():
        assert any(
            a <= r["span_start"] and r["span_end"] <= b
            for a, b in biv.get(r["doc_id"], [])
        ), (r["doc_id"], r["span_start"], r["span_end"])


def test_window_validation(ray_session):
    with pytest.raises(ValueError, match="window"):
        duplicate_spans("/nonexistent", window=1)
    with pytest.raises(ValueError, match="window"):
        strip_duplicate_spans("/nonexistent", window=0)
