"""PII scrub / heavy-hitter / histogram text ops (unit level — the
sf-dir pipelines are additionally oracle-gated by the driver)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mhdb_tables2turtles_ray.pipelines.text import PII_PATTERNS


def _scrub_batch(texts):
    """Apply the pipeline's exact per-batch scrub to a local batch."""
    text = pa.array(texts, pa.string())
    total = np.zeros(len(texts), dtype=np.int64)
    for pattern, token in PII_PATTERNS:
        total += (
            pc.count_substring_regex(text, pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        text = pc.replace_substring_regex(text, pattern, token)
    return text.to_pylist(), total.tolist()


def test_pii_scrub_redacts():
    clean, counts = _scrub_batch(
        [
            "mail me at jane.doe+x@example.co.uk today",
            "call 555-123-4567 or 555.987.6543",
            "server at 192.168.0.1 port 80",
            "no pii here at all",
            "combo a@b.io 10.0.0.7 555-000-1111",
        ]
    )
    assert clean[0] == "mail me at [EMAIL] today"
    assert clean[1] == "call [PHONE] or [PHONE]"
    assert clean[2] == "server at [IP] port 80"
    assert clean[3] == "no pii here at all"
    assert clean[4] == "combo [EMAIL] [IP] [PHONE]"
    assert counts == [1, 2, 1, 0, 1 + 1 + 1]


def test_pii_scrub_sequential_counting():
    """A redaction token must not be re-counted by later patterns: the
    engine counts each pattern on the already-scrubbed text."""
    clean, counts = _scrub_batch(["x@y.zz then 1.2.3.4"])
    assert clean == ["[EMAIL] then [IP]"]
    assert counts == [2]


def test_top_tokens_and_histogram(ray_session):
    from mhdb_tables2turtles_ray.pipelines.text import (
        length_histogram,
        top_tokens,
    )

    sf = "/root/testdata/sf0.001"
    top = top_tokens(sf, k=5).take_all()
    assert len(top) == 5
    counts = [r["n"] for r in top]
    assert counts == sorted(counts, reverse=True)  # count-desc order

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    hist = length_histogram(sf).take_all()
    assert sum(r["n_docs"] for r in hist) == n_docs  # partition of the corpus
    assert all(r["bucket"] >= 0 for r in hist)


def test_batch_grams_vectorized_semantics():
    """Gram builder: lowercased, empty-token-free, never crosses row
    boundaries — matching regexp_extract_all('\\S+') tokenization."""
    import numpy as np
    import pyarrow as pa

    from mhdb_tables2turtles_ray.pipelines.text import _batch_grams

    col = pa.array(["The quick  Brown fox", None, "  a b  ", "x y z"])
    idx, grams = _batch_grams(col, 3)
    got = sorted(zip(idx.tolist(), grams.tolist()))
    assert got == [
        (0, "quick brown fox"),
        (0, "the quick brown"),
        (3, "x y z"),
    ]
    # n longer than any row -> empty, well-typed
    idx2, grams2 = _batch_grams(col, 9)
    assert len(idx2) == 0 and len(grams2) == 0


def test_decontaminate_rejects_degenerate_ngram(ray_session):
    """n=0 would degenerate the gram builder into matching any shared
    token against the test set's last row — must raise, not over-drop."""
    import pyarrow as pa
    import pytest
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.text import decontaminate_pair

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1], "text": ["a b c"]})
    )
    with pytest.raises(ValueError, match=">= 1"):
        decontaminate_pair(ds, ds, n=0)


def test_decontaminate_bloom_path_matches_exact(ray_session):
    """Forcing the hashed-Bloom filter representation (exact_threshold=0)
    must keep every exact hit (Bloom has no false negatives) and add at
    most a tiny deterministic false-positive tail."""
    from mhdb_tables2turtles_ray.pipelines.text import decontaminate

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["doc_id"], r["n_hits"]) for r in decontaminate(sf).take_all()
    }
    bloom = {
        (r["doc_id"], r["n_hits"])
        for r in decontaminate(sf, exact_threshold=0).take_all()
    }
    exact_ids = {d for d, _ in exact}
    bloom_ids = {d for d, _ in bloom}
    assert exact_ids <= bloom_ids
    # hits on truly-contaminated docs can only grow under FPs
    bloom_hits = dict(bloom)
    assert all(bloom_hits[d] >= h for d, h in exact)
    assert len(bloom_ids - exact_ids) <= 5  # fpp=1e-4 over ~1e5 probes


def test_bpe_ish_subtoken_count_diverges_and_matches_duckdb(ray_session):
    """On punctuation/digit-mixed text the BPE-ish segment count must
    exceed the whitespace count, and Arrow's RE2 must agree with
    DuckDB's RE2 on the shared pattern verbatim."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    from mhdb_tables2turtles_ray.pipelines.text import BPE_ISH_RE

    texts = [
        "don't stop-me now: 3.14 works!",
        "héllo wörld 2024…ok",
        "   ",
        "a,b;c",
    ]
    col = pa.array(texts)
    ours_ws = pc.count_substring_regex(col, r"\S+").to_pylist()
    ours_sub = pc.count_substring_regex(col, BPE_ISH_RE).to_pylist()

    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT len(regexp_extract_all(?, ' ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert ours_sub == duck
    assert ours_sub[0] > ours_ws[0]  # punctuation splits segments
    assert ours_sub[3] == 5 and ours_ws[3] == 1


def test_bm25_score_matches_reference(ray_session, sf_small):
    """BM25 scores equal a direct single-process reference computation
    (same tokenization, Lucene idf, same rounding) on the real corpus."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.functions.numeric import round_half_away
    from mhdb_tables2turtles_ray.pipelines.text import bm25_score

    query = "the scan batch"
    k1, b = 1.2, 0.75
    t = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        d: ((x or "").lower().split())
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    terms = sorted(set(query.lower().split()))
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    df = {w: sum(1 for v in docs.values() if w in v) for w in terms}
    idf = {w: math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5)) for w in terms}
    exp = {}
    for d, toks in docs.items():
        dl = len(toks)
        s = 0.0
        hit = False
        for w in terms:
            tf = toks.count(w)
            hit = hit or tf > 0
            s += idf[w] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if hit:
            exp[d] = float(round_half_away(np.array([s]), 6)[0])

    got = {
        r["doc_id"]: r["score"]
        for r in bm25_score(sf_small, query, k1=k1, b=b).take_all()
    }
    assert got == exp
    assert len(got) > 0


def test_bm25_score_validation_and_null_text(ray_session, tmp_path):
    """Empty query rejected; null-text docs score as empty docs (0
    tokens) and never match."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from mhdb_tables2turtles_ray.pipelines.text import bm25_score

    with pytest.raises(ValueError, match="no terms"):
        bm25_score("/root/testdata/sf0.001", "   ")

    pq.write_table(
        pa.table(
            {"doc_id": pa.array([1, 2, 3], pa.int64()),
             "text": pa.array(["alpha beta", None, "beta beta"], pa.string())}
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = bm25_score(str(tmp_path), "beta").take_all()
    ids = {r["doc_id"] for r in rows}
    assert ids == {1, 3}
    by = {r["doc_id"]: r["score"] for r in rows}
    assert by[3] > by[1] > 0  # higher tf, shorter doc wins


def _ref_chunks(text, max_tokens, overlap):
    toks = (text or "").split()
    if not toks:
        return []
    stride = max_tokens - overlap
    out = []
    j = 0
    while True:
        window = toks[j * stride : j * stride + max_tokens]
        out.append((j, len(window), " ".join(window)))
        if j * stride + max_tokens >= len(toks):
            break
        j += 1
    return out


def test_chunk_documents_matches_reference(ray_session, tmp_path):
    """Chunk windows, overlap, short-tail and empty/null docs all match
    a direct reference implementation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.text import chunk_documents

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{rng.integers(0, 50)}" for _ in range(n))
        for n in [0, 1, 7, 8, 9, 16, 25, 100]
    ] + [None, "   ", "a b c"]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    for max_tokens, overlap in [(8, 2), (8, 0), (5, 4)]:
        got = sorted(
            (r["doc_id"], r["chunk"], r["n_tokens"], r["text"])
            for r in chunk_documents(
                str(tmp_path), max_tokens=max_tokens, overlap=overlap
            ).take_all()
        )
        exp = sorted(
            (d, j, n, s)
            for d, txt in enumerate(texts)
            for (j, n, s) in _ref_chunks(txt, max_tokens, overlap)
        )
        assert got == exp, (max_tokens, overlap)


def test_chunk_documents_real_corpus_invariants(ray_session, sf_small):
    """On the real corpus: every chunk respects max_tokens, consecutive
    chunks share exactly `overlap` tokens, and concatenating stride
    prefixes reconstructs each document."""
    from mhdb_tables2turtles_ray.pipelines.text import chunk_documents

    max_tokens, overlap = 16, 4
    stride = max_tokens - overlap
    rows = chunk_documents(sf_small, max_tokens=max_tokens, overlap=overlap).take_all()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        assert 0 < r["n_tokens"] <= max_tokens
        by_doc.setdefault(r["doc_id"], []).append(r)
    import pyarrow.parquet as pq

    texts = dict(
        zip(
            pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
            .column("doc_id").to_pylist(),
            pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "text"])
            .column("text").to_pylist(),
        )
    )
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk"])
        assert [c["chunk"] for c in chunks] == list(range(len(chunks)))
        toks = []
        for c in chunks:
            ct = c["text"].split()
            if toks:
                assert toks[-overlap:] == ct[:overlap] if overlap else True
            toks.extend(ct[overlap:] if toks and overlap else ct if not toks else ct[overlap:])
        assert toks == (texts[d] or "").split()


def test_chunk_documents_validation(ray_session):
    import pytest

    from mhdb_tables2turtles_ray.pipelines.text import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents("/root/testdata/sf0.001", max_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents("/root/testdata/sf0.001", max_tokens=0)


def test_encode_documents_roundtrip_and_unk(ray_session, tmp_path):
    """Token ids decode back to the original tokens (vocab words),
    out-of-vocab tokens map to UNK=0 and are counted, and ids are
    deterministic rank order (count desc, token asc)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.text import encode_documents

    texts = [
        "b b b a a c",   # counts: b=3, a=2+1, c=1+1
        "a c rare1",
        None,
        "rare2 rare3 b",
    ]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(4), pa.int64()),
             "text": pa.array(texts, pa.string())}
        ),
        str(tmp_path / "documents.parquet"),
    )
    ds, vocab = encode_documents(str(tmp_path), vocab_size=3)
    v = vocab.to_pydict()
    # counts: b=4, a=3, c=2 → ids 1,2,3
    assert v["token"] == ["b", "a", "c"] and v["id"] == [1, 2, 3]
    rows = {r["doc_id"]: r for r in ds.take_all()}
    assert rows[0]["input_ids"] == [1, 1, 1, 2, 2, 3]
    assert rows[0]["n_unk"] == 0 and rows[0]["n_tokens"] == 6
    assert rows[1]["input_ids"] == [2, 3, 0]
    assert rows[1]["n_unk"] == 1
    assert rows[2]["input_ids"] == [] and rows[2]["n_tokens"] == 0
    assert rows[3]["input_ids"] == [0, 0, 1] and rows[3]["n_unk"] == 2
    # schema: int32 ids
    assert ds.schema().base_schema.field("input_ids").type == pa.list_(pa.int32())


def test_encode_documents_real_corpus(ray_session, sf_small):
    """On the real corpus: every in-vocab id decodes to a token whose
    corpus frequency matches the vocab table, and the unk rate drops as
    vocab grows."""
    from mhdb_tables2turtles_ray.pipelines.text import encode_documents

    ds_small, _ = encode_documents(sf_small, vocab_size=16)
    ds_big, _ = encode_documents(sf_small, vocab_size=4096)
    unk_small = sum(r["n_unk"] for r in ds_small.take_all())
    unk_big = sum(r["n_unk"] for r in ds_big.take_all())
    tok_total = sum(r["n_tokens"] for r in ds_big.take_all())
    assert unk_big < unk_small
    assert unk_big < tok_total
