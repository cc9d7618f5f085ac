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


def test_curate_source_cap_stage(ray_session):
    """Per-source quota: every source is represented by at most
    ``source_cap`` survivors and the stage slots between the quality
    filter and exact dedup. (No subset-of-uncapped claim: capping away
    a dup cluster's smallest doc legitimately changes which
    representative the keep-one stages pick.)"""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    langs = ("en", "de", "fr")
    cap = 5
    capped_ds, funnel = curate_corpus(sf, langs=langs, source_cap=cap)
    capped = {r["doc_id"] for r in capped_ds.take_all()}

    assert (
        funnel["after_quality_lang"]
        >= funnel["after_source_cap"]
        >= funnel["after_exact_dedup"]
        >= funnel["after_near_dedup"]
        == len(capped)
        > 0
    )
    # funnel keys in stage order
    keys = list(funnel)
    assert keys.index("after_quality_lang") < keys.index("after_source_cap")
    assert keys.index("after_source_cap") < keys.index("after_exact_dedup")

    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source"]
    )
    src = dict(
        zip(docs.column("doc_id").to_pylist(), docs.column("source").to_pylist())
    )
    counts: dict[str, int] = {}
    for d in capped:
        counts[src[d]] = counts.get(src[d], 0) + 1
    assert max(counts.values()) <= cap
    # the cap actually bit: without it at least one source exceeds it
    uncapped_ds, unfunnel = curate_corpus(sf, langs=langs)
    ucounts: dict[str, int] = {}
    for r in uncapped_ds.take_all():
        s = src[r["doc_id"]]
        ucounts[s] = ucounts.get(s, 0) + 1
    assert max(ucounts.values()) > cap
    assert "after_source_cap" not in unfunnel


def test_curate_source_cap_null_source_kept(ray_session):
    """A doc with a NULL source carries no quota evidence: it bypasses
    the cap (the funnel's no-evidence→keep convention) — and an
    all-null source column cannot empty the corpus through the cap."""
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    # distinct content words per doc (only the en markers shared), so
    # the near-dup stages remove nothing and the cap is the only cut
    def text(i):
        return f"the w{i}a w{i}b w{i}c and w{i}d w{i}e w{i}f w{i}g"

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "text": pa.array([text(i) for i in range(8)], pa.string()),
                "source": pa.array(
                    ["s"] * 4 + [None] * 4, pa.string()
                ),
            }
        )
    )
    survivors, funnel = curate_corpus(ds=ds, source_cap=2)
    kept = {r["doc_id"] for r in survivors.take_all()}
    # 2 of the 4 sourced docs capped away; all 4 null-source docs kept
    assert funnel["after_source_cap"] == 6
    assert len(kept & {4, 5, 6, 7}) == 4

    all_null = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array([text(i) for i in range(4)], pa.string()),
                "source": pa.array([None] * 4, pa.string()),
            }
        )
    )
    survivors2, funnel2 = curate_corpus(ds=all_null, source_cap=1)
    assert funnel2["after_source_cap"] == 4
    assert {r["doc_id"] for r in survivors2.take_all()} == {0, 1, 2, 3}


def test_curate_source_cap_invalid_cap_fails_fast(ray_session):
    import pytest

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    with pytest.raises(ValueError, match="source_cap"):
        curate_corpus("/root/testdata/sf0.001", source_cap=0)


def test_curate_source_cap_requires_column(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["one two three four five"] * 2})
    )
    with pytest.raises(ValueError, match="source"):
        curate_corpus(ds=ds, source_cap=5)


def test_curate_corpus_language_filter(ray_session):
    """Restricting langs shrinks (or keeps equal) the first funnel stage."""
    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    _, all_langs = curate_corpus(sf, langs=("en", "de", "fr"))
    _, en_only = curate_corpus(sf, langs=("en",))
    assert en_only["after_quality_lang"] <= all_langs["after_quality_lang"]
    assert en_only["after_near_dedup"] <= all_langs["after_near_dedup"]


def test_curate_corpus_empty_and_invalid_langs(ray_session):
    """A filter that drops everything returns an empty survivors Dataset
    with a zeroed funnel (no crash through the dedup stages); an
    unsupported language raises instead of silently emptying the corpus."""
    import pytest

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    survivors, funnel = curate_corpus(sf, min_tokens=10**9)
    assert survivors.take_all() == []
    assert funnel["after_quality_lang"] == 0 == funnel["after_near_dedup"]
    assert funnel["input"] > 0

    with pytest.raises(ValueError, match="unsupported language"):
        curate_corpus(sf, langs=("es",))


def test_dedup_keep_best_lsh_no_pairs(ray_session):
    """A corpus with zero LSH candidate pairs passes through whole
    (Dataset.unique's None-on-empty mode must not crash the chain)."""
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.dedup import dedup_keep_best_lsh

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon",
                        "zeta eta theta iota kappa",
                        "completely different words here now",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = {r["doc_id"] for r in dedup_keep_best_lsh(ds=docs).take_all()}
    assert out == {1, 2, 3}


def test_curate_null_text_dropped_deterministically(ray_session):
    """A null text row counts as 0 tokens by explicit rule (coalesce
    before counting), so it is dropped — not left to an undefined
    NaN→int64 cast."""
    import pyarrow as pa
    import ray

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    texts = ["the quick brown fox jumps over the lazy dog again and again"] + [None]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    survivors, summary = curate_corpus(ds=ds, min_tokens=5, langs=["en"])
    assert {r["doc_id"] for r in survivors.take_all()} == {1}
    assert summary["after_quality_lang"] == 1


def test_curate_decontamination_stage(ray_session):
    """With a benchmark test set supplied, the funnel must additionally
    drop exactly the surviving docs that share an 8-gram with it."""
    import pyarrow as pa
    import ray

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    leak = "the quick brown fox jumps over the lazy dog tonight"
    clean = "a completely different sentence about the weather in paris today"
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([leak + " extra tail", clean], pa.string()),
            }
        )
    )
    test_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([900], pa.int64()),
                "text": pa.array(["benchmark prompt: " + leak], pa.string()),
            }
        )
    )
    survivors, summary = curate_corpus(
        ds=ds, min_tokens=3, langs=["en"], decontam_test_ds=test_ds
    )
    assert {r["doc_id"] for r in survivors.take_all()} == {2}
    assert summary["after_near_dedup"] == 2
    assert summary["after_decontam"] == 1

    # without a test set the key is absent and nothing is dropped
    survivors2, summary2 = curate_corpus(ds=ds, min_tokens=3, langs=["en"])
    assert "after_decontam" not in summary2
    assert {r["doc_id"] for r in survivors2.take_all()} == {1, 2}


def test_prepare_training_data_end_to_end(ray_session, tmp_path):
    """curate → resample → shard write: output shards contain exactly
    the curated survivors replicated by the md5-weight rule, replicas
    carry distinct uids, shard files are deterministic across reruns,
    and resume skips finished shards."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.curate import (
        curate_corpus,
        prepare_training_data,
    )
    from tests.test_shards import _expected_reps

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "shards")
    weights = {"en": 2.25}
    summary = prepare_training_data(
        sf, out, weights=weights, n_shards=4, seed=9,
        langs=("en", "de", "fr"),
    )
    assert summary["after_resample"] is not None
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert len(summary["shards"]["written"]) == len(files)
    assert summary["shards"]["skipped"] == []  # all written fresh
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert set(df.columns) == {"uid", "doc_id", "copy", "lang", "text"}
    assert summary["after_resample"] == len(df)

    # replica counts follow the rule applied to the curated survivors
    survivors_ds, _ = curate_corpus(sf, langs=("en", "de", "fr"))
    survivors = {r["doc_id"] for r in survivors_ds.take_all()}
    langs = dict(zip(df["doc_id"], df["lang"]))
    got = df.groupby("doc_id")["copy"].agg(["count", "min", "max"])
    assert set(got.index) <= survivors
    for d in survivors:
        r = _expected_reps(d, langs.get(d, "?"), weights, 9)
        if d in got.index:
            row = got.loc[d]
            assert row["count"] == r and row["min"] == 0 and row["max"] == r - 1
        else:
            assert r == 0 or langs.get(d) is None
    # uids distinct; an upsampled doc's copies spread across shards runs
    assert df["uid"].is_unique

    # rerun into a fresh dir: byte-identical shard files
    out2 = str(tmp_path / "shards2")
    prepare_training_data(
        sf, out2, weights=weights, n_shards=4, seed=9,
        langs=("en", "de", "fr"),
    )
    for f1, f2 in zip(files, sorted(glob.glob(f"{out2}/*.parquet"))):
        assert open(f1, "rb").read() == open(f2, "rb").read()

    # resume: rerun into the SAME dir skips everything
    summary3 = prepare_training_data(
        sf, out, weights=weights, n_shards=4, seed=9,
        langs=("en", "de", "fr"),
    )
    assert len(summary3["shards"]["skipped"]) == 4
    assert summary3["after_resample"] is None  # honest partial-count rule


def test_prepare_training_data_caller_ds(ray_session, tmp_path):
    """When curation ran on a caller-supplied dataset, the mix step
    sources text from the SAME dataset — and a ds missing the mix
    columns is rejected loudly."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.curate import prepare_training_data

    docs = pd.DataFrame(
        {
            "doc_id": range(100, 110),
            "lang": ["en"] * 10,
            # 'the' = en marker (passes the vote); per-doc unique tokens
            # (no near-dup clustering)
            "text": [
                f"the w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f" for i in range(10)
            ],
        }
    )
    out = str(tmp_path / "s")
    summary = prepare_training_data(
        None, out, n_shards=2, seed=4, ds=ray.data.from_pandas(docs),
    )
    written = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(f"{out}/*.parquet")]
    )
    assert set(written["doc_id"]) <= set(docs["doc_id"])
    assert summary["after_resample"] == len(written) > 0
    # the texts are the caller's, not any sf_dir table's
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    assert all(t == by_id[d] for d, t in zip(written["doc_id"], written["text"]))

    with pytest.raises(ValueError, match="missing"):
        prepare_training_data(
            None, str(tmp_path / "s2"), n_shards=2,
            ds=ray.data.from_pandas(docs[["doc_id", "text"]]),
        )


def test_prepare_training_data_strip_spans(ray_session, tmp_path):
    """With strip_spans_window set, shards carry span-stripped text:
    the boilerplate passage shared by otherwise-distinct docs is cut
    from every copy, unique text survives verbatim."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.curate import prepare_training_data

    boiler = "alpha beta gamma delta epsilon zeta"  # 6-token boilerplate
    docs = pd.DataFrame(
        {
            "doc_id": range(200, 210),
            "lang": ["en"] * 10,
            # 'the' = en marker, separated from the boilerplate by a
            # per-doc unique token so no shared window can reach it
            "text": [
                f"the u{i}a {boiler} u{i}b u{i}c u{i}d u{i}e" for i in range(10)
            ],
        }
    )
    out = str(tmp_path / "stripped")
    summary = prepare_training_data(
        None, out, n_shards=2, seed=4, strip_spans_window=6,
        ds=ray.data.from_pandas(docs),
    )
    written = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(f"{out}/*.parquet")]
    )
    assert summary["after_near_dedup"] == 10  # no doc-level dups
    assert len(written) == 10
    by_id = dict(zip(written["doc_id"], written["text"]))
    for i in range(10):
        assert by_id[200 + i] == f"the u{i}a u{i}b u{i}c u{i}d u{i}e"
    # and without the stage, the boilerplate survives untouched
    out2 = str(tmp_path / "plain")
    prepare_training_data(
        None, out2, n_shards=2, seed=4,
        ds=ray.data.from_pandas(docs),
    )
    plain = pd.concat(
        [pq.read_table(f).to_pandas() for f in glob.glob(f"{out2}/*.parquet")]
    )
    assert all(boiler in t for t in plain["text"])


def test_curate_perplexity_stage(ray_session):
    """ppl_max adds the CCNet-style LM filter between exact dedup and
    near-dup removal: the one statistically-odd doc is dropped, the
    summary grows the after_perplexity count, and a loose threshold is
    a no-op."""
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus
    from mhdb_tables2turtles_ray.pipelines.lm import score_perplexity

    # en-voted docs ("the" marker), >= 5 tokens; doc 99 reuses corpus
    # tokens in transitions the LM never sees elsewhere -> max ppl
    base = [f"the quick brown fox jumps over lazy dog n{i}" for i in range(12)]
    odd = "the dog fox brown quick jumps n0 lazy over"

    def rebuild():
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(base) + 1), pa.int64()),
                    "text": pa.array(base + [odd], pa.string()),
                }
            )
        ).repartition(2)

    # the odd doc really is the perplexity max among the survivors
    scored = score_perplexity(None, ds=rebuild()).to_pandas()
    odd_ppl = float(scored.loc[scored.doc_id == len(base), "ppl"].iloc[0])
    assert odd_ppl == scored["ppl"].max()

    cutoff = (scored["ppl"].sort_values().iloc[-2] + odd_ppl) / 2
    kept, funnel = curate_corpus(None, ds=rebuild(), ppl_max=float(cutoff))
    kept_ids = {r["doc_id"] for r in kept.take_all()}
    assert len(base) not in kept_ids  # the odd doc is gone
    assert funnel["after_perplexity"] == funnel["after_exact_dedup"] - 1
    assert funnel["after_near_dedup"] <= funnel["after_perplexity"]

    # a loose threshold keeps everything and still reports the stage
    _, loose = curate_corpus(None, ds=rebuild(), ppl_max=1e9)
    assert loose["after_perplexity"] == loose["after_exact_dedup"]
    # without the arg the key is absent (schema follows the arguments)
    _, plain = curate_corpus(None, ds=rebuild())
    assert "after_perplexity" not in plain


def test_prepare_training_data_tokenized_jsonl(ray_session, tmp_path):
    """curate → mix → BPE tokenize → JSONL shard write: shards carry
    input_ids instead of text, the ids decode consistently with an
    independently trained model on the same curated set, and reruns are
    byte-identical."""
    import glob
    import json
    import os

    from mhdb_tables2turtles_ray.pipelines.bpe import encode_word, train_bpe
    from mhdb_tables2turtles_ray.pipelines.curate import (
        curate_corpus,
        prepare_training_data,
    )
    from mhdb_tables2turtles_ray.stages.semijoin import build_key_filter, semi_join
    from mhdb_tables2turtles_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "tok")
    summary = prepare_training_data(
        sf, out, n_shards=4, seed=9, langs=("en", "de", "fr"),
        bpe_merges=30, shard_file_format="jsonl",
    )
    assert summary["bpe"]["merges"] == 30 and not summary["bpe"]["truncated"]
    rows = []
    for f in sorted(glob.glob(f"{out}/*.jsonl")):
        with open(f, encoding="utf-8") as fh:
            rows.extend(json.loads(line) for line in fh)
    assert rows and set(rows[0]) == {
        "uid", "doc_id", "copy", "lang", "input_ids", "n_pieces", "n_unk"
    }
    assert summary["after_resample"] == len(rows)
    # model trained on the curated docs -> curated docs encode UNK-free
    assert all(r["n_unk"] == 0 for r in rows)
    assert all(r["n_pieces"] == len(r["input_ids"]) for r in rows)

    # the ids match an independent train+encode over the same curated set
    import ray

    survivors_ds, _ = curate_corpus(sf, langs=("en", "de", "fr"))
    docs = read_table(sf, "documents", columns=["doc_id", "text"])
    curated = semi_join(
        docs, "doc_id", ray.put(build_key_filter(survivors_ds, "doc_id",
                                                 exact_threshold=None))
    )
    model = train_bpe(sf, num_merges=30, ds=curated)
    ranks = {m: i for i, m in enumerate(model["merges"])}
    ids = {s: i + 1 for i, s in enumerate(model["vocab"])}
    text_by_id = {
        r["doc_id"]: r["text"] for r in curated.take_all()
    }
    for r in rows[:40]:
        want = [
            ids.get(s, 0)
            for w in (text_by_id[r["doc_id"]] or "").split()
            for s in encode_word(w, ranks)
        ]
        assert r["input_ids"] == want

    # rerun in a fresh dir: byte-identical shard manifests
    out2 = str(tmp_path / "tok2")
    prepare_training_data(
        sf, out2, n_shards=4, seed=9, langs=("en", "de", "fr"),
        bpe_merges=30, shard_file_format="jsonl",
    )

    def shas(d):
        import json as _j
        return {
            n: _j.load(open(os.path.join(d, "_manifests", n)))["sha256"]
            for n in sorted(os.listdir(os.path.join(d, "_manifests")))
        }

    assert shas(out) == shas(out2)


def test_curate_length_percentile_cut(ray_session):
    """length_pct_max drops docs strictly longer than the exact
    quantile_cont cut of the post-quality token-count distribution:
    100 ten-token docs + 5 thousand-token docs at pct 0.9 → cut 10,
    the 5 outliers drop, nothing else does."""
    import pyarrow as pa
    import pytest
    import ray

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    rows = []
    for i in range(100):
        toks = ["the", "a"] + [f"w{i}t{j}" for j in range(8)]
        rows.append((i, " ".join(toks)))
    for i in range(100, 105):
        toks = ["the", "a"] + [f"L{i}t{j}" for j in range(998)]
        rows.append((i, " ".join(toks)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    survivors_ds, funnel = curate_corpus(
        None, ds=ds, langs=("en",), length_pct_max=0.9
    )
    assert list(funnel)[:4] == [
        "input", "after_quality_lang", "after_length_cut", "after_exact_dedup"
    ]
    assert funnel["input"] == 105
    assert funnel["after_quality_lang"] == 105
    assert funnel["after_length_cut"] == 100
    survivors = {r["doc_id"] for r in survivors_ds.take_all()}
    assert survivors == set(range(100))
    # pct 1.0 keeps everything (cut == max length)
    _, full = curate_corpus(None, ds=ds, langs=("en",), length_pct_max=1.0)
    assert full["after_length_cut"] == 105
    with pytest.raises(ValueError, match="length_pct_max"):
        curate_corpus(None, ds=ds, langs=("en",), length_pct_max=1.5)


def test_curate_semantic_dedup_stage(ray_session):
    """embeddings_ds adds a semantic near-dup stage: planted vector
    clusters among textually-distinct docs collapse to one doc each;
    docs without an embedding are kept (no evidence)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    rng = np.random.default_rng(23)
    rows = []
    for i in range(40):
        toks = ["the", "a"] + [f"u{i}w{j}" for j in range(8)]
        rows.append((i, " ".join(toks)))
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    # docs 0-3 share one embedding direction, 4-7 another; 8-19 unique;
    # 20-39 have NO embedding row at all
    dim = 16
    base1, base2 = rng.normal(0, 1, dim), rng.normal(0, 1, dim)
    eids, evecs = [], []
    for i in range(4):
        eids.append(i); evecs.append(base1 + rng.normal(0, 1e-4, dim))
    for i in range(4, 8):
        eids.append(i); evecs.append(base2 + rng.normal(0, 1e-4, dim))
    for i in range(8, 20):
        eids.append(i); evecs.append(rng.normal(0, 1, dim))
    emb = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(eids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in evecs], pa.list_(pa.float64())
                ),
            }
        )
    )
    survivors_ds, funnel = curate_corpus(
        None, ds=docs, langs=("en",), embeddings_ds=emb
    )
    survivors = {r["doc_id"] for r in survivors_ds.take_all()}
    assert funnel["after_near_dedup"] == 40  # texts all distinct
    # clusters {0..3} and {4..7} keep their min id; everyone else stays
    assert survivors == ({0, 4} | set(range(8, 40)))
    assert funnel["after_semantic_dedup"] == len(survivors) == 34


def test_prepare_training_data_with_saved_model(ray_session, tmp_path):
    """bpe_model_path encodes with a persisted tokenizer: shards carry
    the SAME ids as an in-flow-trained run whose model was saved."""
    import glob
    import json as _json

    import pytest

    from mhdb_tables2turtles_ray.pipelines.bpe import save_bpe_model, train_bpe
    from mhdb_tables2turtles_ray.pipelines.curate import prepare_training_data

    sf = "/root/testdata/sf0.001"
    # train on the full documents table and persist
    model = train_bpe(sf, num_merges=20)
    mpath = str(tmp_path / "m.parquet")
    save_bpe_model(model, mpath)

    out = str(tmp_path / "o")
    summary = prepare_training_data(
        sf, out, n_shards=2, seed=3, langs=("en", "de", "fr"),
        bpe_model_path=mpath, shard_file_format="jsonl",
    )
    assert summary["bpe"]["loaded_from"] == mpath
    rows = []
    for f in sorted(glob.glob(f"{out}/*.jsonl")):
        with open(f, encoding="utf-8") as fh:
            rows.extend(_json.loads(line) for line in fh)
    assert rows and all("input_ids" in r for r in rows)
    with pytest.raises(ValueError, match="not both"):
        prepare_training_data(
            sf, str(tmp_path / "x"), n_shards=2,
            bpe_merges=10, bpe_model_path=mpath,
        )


def test_funnel_checkpoint_resume(ray_session, tmp_path):
    """Funnel-level checkpointed resume (state/funnel.py): a rerun with
    the same checkpoint_dir skips every completed stage; a kill after
    exact-dedup (simulated by removing the near-dedup generation)
    resumes AT that stage; every variant reproduces the non-checkpointed
    survivor set exactly; changed parameters raise."""
    import shutil

    import pytest as _pytest

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    ckpt = str(tmp_path / "funnel_ckpt")

    def ids_of(ds):
        return sorted(r["doc_id"] for r in ds.take_all())

    plain_ds, plain_sum = curate_corpus(sf)  # no checkpointing
    s1, sum1 = curate_corpus(sf, checkpoint_dir=ckpt)
    assert sum1["resumed_stages"] == []
    assert ids_of(s1) == ids_of(plain_ds)
    stage_keys = [k for k in plain_sum if k != "input"]
    assert all(sum1[k] == plain_sum[k] for k in stage_keys)

    # rerun: EVERY stage resumes from its marker, ids identical
    s2, sum2 = curate_corpus(sf, checkpoint_dir=ckpt)
    assert sum2["resumed_stages"] == [
        "after_quality_lang", "after_exact_dedup", "after_near_dedup",
    ]
    assert ids_of(s2) == ids_of(plain_ds)
    assert {k: sum2[k] for k in plain_sum} == plain_sum

    # kill-after-exact-dedup: drop the near-dedup generation → resume
    # recomputes ONLY that stage (prefix = quality + exact)
    shutil.rmtree(f"{ckpt}/02_after_near_dedup")
    s3, sum3 = curate_corpus(sf, checkpoint_dir=ckpt)
    assert sum3["resumed_stages"] == [
        "after_quality_lang", "after_exact_dedup",
    ]
    assert ids_of(s3) == ids_of(plain_ds)
    assert {k: sum3[k] for k in plain_sum} == plain_sum

    # parameter mismatch must refuse, not silently mix generations
    with _pytest.raises(ValueError, match="parameter mismatch"):
        curate_corpus(sf, min_tokens=7, checkpoint_dir=ckpt)


def test_funnel_checkpoint_resume_with_decontam(ray_session, tmp_path):
    """Resume of the LAST stage when it needs a rebuilt earlier
    boundary: decontamination probes the exact-deduped docs, which on
    resume are reconstructed from the exact-dedup id generation."""
    import shutil

    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    ckpt = str(tmp_path / "ck2")
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    test_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": docs.column("doc_id")[:3],
                "text": docs.column("text")[:3],
            }
        )
    )

    def run(**kw):
        ds, s = curate_corpus(sf, decontam_test_ds=test_ds, **kw)
        return sorted(r["doc_id"] for r in ds.take_all()), s

    ids0, sum0 = run()
    ids1, sum1 = run(checkpoint_dir=ckpt)
    assert ids1 == ids0

    # drop only the final decontam generation: everything else resumes
    shutil.rmtree(f"{ckpt}/03_after_decontam")
    ids2, sum2 = run(checkpoint_dir=ckpt)
    assert sum2["resumed_stages"] == [
        "after_quality_lang", "after_exact_dedup", "after_near_dedup",
    ]
    assert ids2 == ids0
    assert sum2["after_decontam"] == sum0["after_decontam"]


def test_funnel_checkpoint_input_guard_and_id_only_generations(
    ray_session, tmp_path
):
    """Round-5 review fixes: (1) resuming a checkpoint_dir against a
    corpus of a different size refuses loudly instead of returning the
    old run's survivors; (2) every checkpointed generation is id-only
    (a text column there would be a corpus-sized checkpoint at scale);
    (3) the returned survivors Dataset is the documented (doc_id) shape."""
    import glob

    import pyarrow.parquet as pq
    import pytest as _pytest
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus
    from mhdb_tables2turtles_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    ckpt = str(tmp_path / "guard_ckpt")
    survivors, _ = curate_corpus(sf, checkpoint_dir=ckpt)
    assert survivors.schema().names == ["doc_id"]

    # every persisted generation carries ONLY doc_id
    for part in glob.glob(f"{ckpt}/*/part-*.parquet"):
        assert pq.read_schema(part).names == ["doc_id"], part

    # same params, truncated corpus -> input-mismatch refusal
    truncated = read_table(sf, "documents", columns=["doc_id", "text"]).limit(
        100
    )
    with _pytest.raises(ValueError, match="input mismatch"):
        curate_corpus(None, ds=truncated, checkpoint_dir=ckpt)


def test_funnel_checkpoint_empty_corpus_reports_resumed_stages(
    ray_session, tmp_path
):
    """The all-dropped short-circuit must honor the checkpointed-run
    contract (summary carries resumed_stages) — stress/CLI consumers
    read the key unconditionally."""
    from mhdb_tables2turtles_ray.pipelines.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    ckpt = str(tmp_path / "empty_ckpt")
    _, s1 = curate_corpus(sf, min_tokens=10**9, checkpoint_dir=ckpt)
    assert s1["after_quality_lang"] == 0
    assert s1["resumed_stages"] == []
    _, s2 = curate_corpus(sf, min_tokens=10**9, checkpoint_dir=ckpt)
    assert s2["resumed_stages"] == ["after_quality_lang"]
