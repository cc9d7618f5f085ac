"""BPE tokenizer training + encoding (`pipelines/bpe.py`).

The trainer oracle is the naive Sennrich loop — recount EVERY pair each
round, pick (count desc, pair asc) — run over the same word-frequency
table; the incremental update-in-place trainer must match it merge for
merge. Encoding is pinned to the training-end symbol states."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from mhdb_tables2turtles_ray.pipelines.bpe import (
    _merge_symbols,
    _word_symbols,
    bpe_encode,
    encode_word,
    merges_table,
    train_bpe,
    word_counts,
)


def _naive_learn(words, counts, num_merges):
    """Reference trainer: full pair recount per round."""
    words = [list(w) for w in words]
    merges = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for wi, syms in enumerate(words):
            for p in zip(syms, syms[1:]):
                pair_counts[p] += int(counts[wi])
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [list(_merge_symbols(tuple(w), best)) for w in words]
    return merges, [tuple(w) for w in words]


def test_merge_symbols_greedy_left_to_right():
    assert _merge_symbols(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert _merge_symbols(("a", "b", "a", "b"), ("a", "b")) == ("ab", "ab")
    assert _merge_symbols(("x",), ("a", "b")) == ("x",)


def test_word_symbols_eow_on_last_char():
    assert _word_symbols("low") == ("l", "o", "w</w>")
    assert _word_symbols("a") == ("a</w>",)
    assert _word_symbols("") == ()


def test_train_matches_naive_reference(sf_small):
    model = train_bpe(sf_small, num_merges=40)
    raw, counts, _ = word_counts(sf_small)
    ref_merges, _ = _naive_learn(
        [_word_symbols(w) for w in raw], counts, 40
    )
    assert model["merges"] == ref_merges
    assert len(model["merges"]) == 40


def test_encode_reproduces_training_end_state(sf_small):
    model = train_bpe(sf_small, num_merges=40)
    raw, counts, _ = word_counts(sf_small)
    _, final_words = _naive_learn([_word_symbols(w) for w in raw], counts, 40)
    ranks = {m: i for i, m in enumerate(model["merges"])}
    for w, final in zip(raw[:200], final_words[:200]):
        assert encode_word(w, ranks) == final


def test_encode_word_round_trip_and_unk():
    ranks = {("a", "b"): 0, ("ab", "c</w>"): 1}
    assert encode_word("abc", ranks) == ("abc</w>",)
    assert encode_word("abd", ranks) == ("ab", "d</w>")
    # concatenation restores the word + eow
    for w in ("abc", "abd", "zzz"):
        assert "".join(encode_word(w, ranks)) == w[:-1] + w[-1] + "</w>"


def test_train_parallelism_invariance(sf_small):
    a = train_bpe(sf_small, num_merges=25)
    b = train_bpe(sf_small, num_merges=25)
    assert a["merges"] == b["merges"]
    assert a["vocab"] == b["vocab"]


def test_word_counts_min_count_and_truncation(sf_small):
    full_words, full_counts, full_trunc = word_counts(sf_small)
    assert not full_trunc
    cap = len(full_words) - 5
    words, counts, truncated = word_counts(sf_small, max_words=cap)
    assert len(words) == cap and truncated
    # ordering: count desc, word asc
    assert list(counts) == sorted(counts, reverse=True)
    assert words == full_words[:cap]
    thresh, _, _ = word_counts(sf_small, min_count=5)
    lookup = dict(zip(full_words, full_counts))
    assert all(lookup[w] >= 5 for w in thresh)
    assert {w for w in full_words if lookup[w] >= 5} == set(thresh)


def test_merges_table_round_trip(sf_small):
    model = train_bpe(sf_small, num_merges=10)
    t = merges_table(model)
    assert t.column_names == ["rank", "left", "right"]
    back = list(
        zip(t.column("left").to_pylist(), t.column("right").to_pylist())
    )
    assert back == model["merges"]


def test_bpe_encode_corpus(sf_small, ray_session):
    import duckdb

    model = train_bpe(sf_small, num_merges=60)
    out = bpe_encode(sf_small, model).to_pandas().set_index("doc_id")

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_small}/documents.parquet')"
    ).fetchall()
    assert len(out) == len(docs)
    ranks = {m: i for i, m in enumerate(model["merges"])}
    ids = {s: i + 1 for i, s in enumerate(model["vocab"])}
    for doc_id, text in docs[:50]:
        words = (text or "").split()
        want = [
            ids.get(s, 0) for w in words for s in encode_word(w, ranks)
        ]
        row = out.loc[doc_id]
        assert list(row["input_ids"]) == want
        assert row["n_pieces"] == len(want)
        assert row["n_unk"] == sum(1 for i in want if i == 0)


def test_bpe_encode_null_and_unknown(ray_session):
    import ray

    model = {
        "merges": [("a", "b")],
        "vocab": ["a", "b", "ab"],
        "end_of_word": "",
        "n_words": 0,
        "truncated": False,
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["ab ab", None, "zz"], pa.string()),
            }
        )
    )
    import mhdb_tables2turtles_ray.pipelines.bpe as bpe_mod

    model_ref = ray.put(model)
    enc = ds.map_batches(
        bpe_mod._BPEEncoder,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    ).to_pandas().set_index("doc_id")
    assert list(enc.loc[1, "input_ids"]) == [3, 3]
    assert enc.loc[2, "n_pieces"] == 0 and len(enc.loc[2, "input_ids"]) == 0
    # "zz": z unseen -> two UNK pieces
    assert enc.loc[3, "n_unk"] == 2
    assert list(enc.loc[3, "input_ids"]) == [0, 0]


def test_save_load_model_round_trip(sf_small, ray_session, tmp_path):
    from mhdb_tables2turtles_ray.pipelines.bpe import (
        load_bpe_model,
        save_bpe_model,
    )

    model = train_bpe(sf_small, num_merges=30)
    path = str(tmp_path / "bpe.parquet")
    save_bpe_model(model, path)
    back = load_bpe_model(path)
    assert back == model
    # a loaded model encodes identically to the original
    a = bpe_encode(sf_small, model).to_pandas().sort_values("doc_id")
    b = bpe_encode(sf_small, back).to_pandas().sort_values("doc_id")
    assert (a["n_pieces"].to_numpy() == b["n_pieces"].to_numpy()).all()
    assert all(
        list(x) == list(y) for x, y in zip(a["input_ids"], b["input_ids"])
    )
    import pytest

    with pytest.raises(ValueError, match="bpe_meta"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        other = str(tmp_path / "not_model.parquet")
        pq.write_table(pa.table({"x": [1]}), other)
        load_bpe_model(other)
