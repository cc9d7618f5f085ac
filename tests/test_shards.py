"""Seeded training shards: deterministic permutation, byte-identical
rewrites, seed sensitivity, resume, and assign/writer agreement."""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
N_SHARDS = 8
SEED = 42


@pytest.fixture()
def docs_ds(ray_session):
    from mhdb_tables2turtles_ray.sources.tables import read_table

    return read_table(SF, "documents", columns=["doc_id", "text"])


def _write(ds, out, seed=SEED, resume=True):
    from mhdb_tables2turtles_ray.pipelines.shards import write_training_shards

    return write_training_shards(
        ds, out, id_col="doc_id", n_shards=N_SHARDS, seed=seed, resume=resume
    )


def _manifest_shas(out):
    mdir = os.path.join(out, "_manifests")
    shas = {}
    for name in sorted(os.listdir(mdir)):
        with open(os.path.join(mdir, name)) as f:
            shas[name] = json.load(f)["sha256"]
    return shas


def _all_ids():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    return set(t.column("doc_id").to_pylist())


def test_shards_cover_corpus_exactly_once(docs_ds, tmp_path):
    out = str(tmp_path / "shards")
    summary = _write(docs_ds, out)
    assert sorted(summary["written"]) == list(range(N_SHARDS))
    seen = []
    for pid in range(N_SHARDS):
        t = pq.read_table(os.path.join(out, f"part-{pid:05d}.parquet"))
        assert t.schema.names == ["doc_id", "text"]  # transient cols dropped
        seen.extend(t.column("doc_id").to_pylist())
    assert len(seen) == len(set(seen))
    assert set(seen) == _all_ids()


def test_rewrite_is_byte_identical_and_matches_assign(docs_ds, tmp_path):
    """Shard bytes are a pure function of (row set, seed, n_shards):
    two independent runs produce identical manifest sha256s, and the
    within-file order replays shard_assign's (shard, pos) order."""
    from mhdb_tables2turtles_ray.pipelines.shards import shard_assign

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    _write(docs_ds, out_a)
    _write(docs_ds, out_b)
    shas_a, shas_b = _manifest_shas(out_a), _manifest_shas(out_b)
    assert shas_a and shas_a == shas_b

    assign = (
        shard_assign(SF, n_shards=N_SHARDS, seed=SEED)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    file_order = []
    for pid in range(N_SHARDS):
        ids = pq.read_table(
            os.path.join(out_a, f"part-{pid:05d}.parquet"), columns=["doc_id"]
        ).column("doc_id").to_pylist()
        file_order.extend((pid, i + 1, d) for i, d in enumerate(ids))
    got = pd.DataFrame(file_order, columns=["shard", "pos", "doc_id"])
    pd.testing.assert_frame_equal(
        got[["doc_id", "shard", "pos"]], assign, check_dtype=False
    )


def test_seed_changes_permutation(docs_ds, tmp_path):
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    _write(docs_ds, out_a, seed=SEED)
    _write(docs_ds, out_b, seed=SEED + 1)
    assert set(_manifest_shas(out_a).values()) != set(
        _manifest_shas(out_b).values()
    )
    # but both are complete permutations of the same corpus
    for out in (out_a, out_b):
        ids = []
        for pid in range(N_SHARDS):
            ids.extend(
                pq.read_table(
                    os.path.join(out, f"part-{pid:05d}.parquet"),
                    columns=["doc_id"],
                ).column("doc_id").to_pylist()
            )
        assert set(ids) == _all_ids()


def test_resume_skips_finished_shards(docs_ds, tmp_path):
    out = str(tmp_path / "shards")
    first = _write(docs_ds, out)
    assert sorted(first["written"]) == list(range(N_SHARDS))
    before = _manifest_shas(out)
    again = _write(docs_ds, out)
    assert again["written"] == []
    assert sorted(again["skipped"]) == list(range(N_SHARDS))
    assert _manifest_shas(out) == before


def test_hash_matches_oracle_convention():
    """The 32 bits the engine mods are the same bits the DuckDB oracle
    parses with '0x' || substr(md5, 1, 8)."""
    from mhdb_tables2turtles_ray.pipelines.shards import _assign_cols

    df = pd.DataFrame({"doc_id": [0, 1, 7, 123456789]})
    hks, shards = _assign_cols(df, "doc_id", SEED, N_SHARDS)
    for h, s, i in zip(hks, shards, df["doc_id"]):
        assert h == hashlib.md5(f"{SEED}:{i}".encode()).hexdigest()
        assert s == int(h[:8], 16) % N_SHARDS


def _pack(budget=256, seed=SEED):
    from mhdb_tables2turtles_ray.pipelines.shards import pack_sequences

    return (
        pack_sequences(SF, budget=budget, n_shards=N_SHARDS, seed=seed)
        .to_pandas()
        .sort_values(["shard", "seq", "doc_id"])
        .reset_index(drop=True)
    )


def test_pack_sequences_invariants(ray_session):
    """Every doc packed exactly once; per-(shard, seq) token totals
    respect the budget unless the sequence is a single oversize doc;
    seq numbers are contiguous from 1 within each shard."""
    budget = 120
    df = _pack(budget=budget)
    assert set(df["doc_id"]) == _all_ids() and len(df) == len(_all_ids())
    per_seq = df.groupby(["shard", "seq"]).agg(
        total=("n_tokens", "sum"), n_docs=("n_tokens", "size")
    )
    over = per_seq[per_seq["total"] > budget]
    assert (over["n_docs"] == 1).all()  # only forced-through oversize docs
    for _, g in df.groupby("shard"):
        seqs = sorted(g["seq"].unique())
        assert seqs == list(range(1, len(seqs) + 1))


def test_pack_sequences_replays_shard_assign_order(ray_session):
    """Concatenating a shard's docs in (seq, permutation-key) order is
    exactly the shard_assign permutation — packing only chunks it."""
    from mhdb_tables2turtles_ray.pipelines.shards import shard_assign

    assign = (
        shard_assign(SF, n_shards=N_SHARDS, seed=SEED)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    df = _pack()
    hk = {
        i: hashlib.md5(f"{SEED}:{i}".encode()).hexdigest()
        for i in df["doc_id"]
    }
    df["_hk"] = df["doc_id"].map(hk)
    df = df.sort_values(["shard", "seq", "_hk", "doc_id"]).reset_index(drop=True)
    assert df["doc_id"].tolist() == assign["doc_id"].tolist()
    # seq is non-decreasing along each shard's permutation stream
    for _, g in df.groupby("shard"):
        assert (g["seq"].diff().dropna() >= 0).all()


def test_stratified_sample_deterministic_and_seed_sensitive(ray_session):
    from mhdb_tables2turtles_ray.pipelines.shards import stratified_sample

    k = 10
    a = (
        stratified_sample(SF, k=k, seed=SEED)
        .to_pandas()
        .sort_values(["lang", "rk"])
        .reset_index(drop=True)
    )
    b = (
        stratified_sample(SF, k=k, seed=SEED)
        .to_pandas()
        .sort_values(["lang", "rk"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # every stratum present with exactly k rows, ranks 1..k
    for _, g in a.groupby("lang"):
        assert g["rk"].tolist() == list(range(1, k + 1))
    assert set(a["lang"]) == {"de", "en", "es", "fr", "zh"}
    c = (
        stratified_sample(SF, k=k, seed=SEED + 1)
        .to_pandas()
        .sort_values(["lang", "rk"])
        .reset_index(drop=True)
    )
    assert set(map(tuple, a[["lang", "doc_id"]].values)) != set(
        map(tuple, c[["lang", "doc_id"]].values)
    )


def test_cap_per_stratum_matches_sql_rule(ray_session):
    """The per-source cap IS the SQL row_number-over-md5 rule: DuckDB
    replays the exact survivor set (md5 hex matches hashlib's)."""
    import duckdb

    from mhdb_tables2turtles_ray.pipelines.shards import cap_per_stratum
    from mhdb_tables2turtles_ray.sources.tables import read_table

    k = 7
    ds = read_table(SF, "documents", columns=["doc_id", "source"])
    got = {
        (r["source"], r["doc_id"])
        for r in cap_per_stratum(ds, "source", k, seed=SEED).take_all()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT source, doc_id FROM (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5('{SEED}:' || CAST(doc_id AS VARCHAR)),
                                    doc_id
                       ) AS rk
                FROM read_parquet('{SF}/documents.parquet')
            ) WHERE rk <= {k}
            """
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_cap_per_stratum_invariance_and_validation(ray_session):
    from mhdb_tables2turtles_ray.pipelines.shards import cap_per_stratum
    from mhdb_tables2turtles_ray.sources.tables import read_table

    ds = read_table(SF, "documents", columns=["doc_id", "source"])
    a = {
        (r["source"], r["doc_id"])
        for r in cap_per_stratum(ds, "source", 5, seed=SEED).take_all()
    }
    # block layout cannot change the survivor set
    b = {
        (r["source"], r["doc_id"])
        for r in cap_per_stratum(
            ds.repartition(13), "source", 5, seed=SEED
        ).take_all()
    }
    assert a == b
    # a different seed is a different draw
    c = {
        (r["source"], r["doc_id"])
        for r in cap_per_stratum(ds, "source", 5, seed=SEED + 1).take_all()
    }
    assert a != c
    # a cap at-or-above every stratum's size keeps everything
    n = ds.count()
    full = cap_per_stratum(ds, "source", n, seed=SEED)
    assert full.count() == n

    with pytest.raises(ValueError, match="cap k"):
        cap_per_stratum(ds, "source", 0)


def test_pack_sequences_null_text_counts_zero(ray_session, tmp_path):
    """Null text counts as 0 tokens BY RULE (the curate.py convention):
    one null doc must not NaN-poison its shard's cumulative sum or
    float-ify the n_tokens column."""
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b c", None, "d e", "f"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from mhdb_tables2turtles_ray.pipelines.shards import pack_sequences

    df = (
        pack_sequences(str(tmp_path), budget=4, n_shards=2, seed=SEED)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df["n_tokens"].dtype == "int64" and df["seq"].dtype == "int64"
    assert df.loc[df["doc_id"] == 2, "n_tokens"].item() == 0
    assert set(df["doc_id"]) == {1, 2, 3, 4}
    # every sequence respects the budget (no doc here exceeds it)
    per = df.groupby(["shard", "seq"])["n_tokens"].sum()
    assert (per <= 4).all()


def _expected_reps(doc_id, lang, weights, seed, default=1.0):
    import hashlib as _h
    import math

    w = float(weights.get(lang, default))
    u = int(_h.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16) / 2.0**32
    return int(math.floor(w)) + (1 if (w - math.floor(w)) > u else 0)


def test_resample_corpus_rule_and_determinism(ray_session, sf_small):
    """Every doc's replica count matches the md5-threshold rule exactly
    (downsample AND upsample), copies number 0..r-1, and two runs are
    identical while a seed change redraws."""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.shards import resample_corpus

    weights = {"en": 0.4, "de": 2.5}
    langs = dict(
        zip(
            pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "lang"])
            .column("doc_id").to_pylist(),
            pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id", "lang"])
            .column("lang").to_pylist(),
        )
    )
    df = resample_corpus(sf_small, weights, seed=7).to_pandas()
    got = df.groupby("doc_id")["copy"].agg(["count", "min", "max"])
    for doc_id, lang in langs.items():
        r = _expected_reps(doc_id, lang, weights, 7)
        if r == 0:
            assert doc_id not in got.index
        else:
            row = got.loc[doc_id]
            assert row["count"] == r and row["min"] == 0 and row["max"] == r - 1
    again = resample_corpus(sf_small, weights, seed=7).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values(["doc_id", "copy"]).reset_index(drop=True),
        again.sort_values(["doc_id", "copy"]).reset_index(drop=True),
    )
    other = resample_corpus(sf_small, weights, seed=8).to_pandas()
    assert set(other["doc_id"]) != set(df["doc_id"])


def test_resample_corpus_identity_and_validation(ray_session, sf_small):
    """default_weight=1.0 with no overrides is the identity sample;
    negative weights are rejected loudly."""
    import pytest

    from mhdb_tables2turtles_ray.pipelines.shards import resample_corpus

    df = resample_corpus(sf_small, {}, seed=3).to_pandas()
    n_docs = len(df)
    assert (df["copy"] == 0).all()
    import pyarrow.parquet as pq

    assert n_docs == pq.read_metadata(f"{sf_small}/documents.parquet").num_rows
    with pytest.raises(ValueError, match="negative"):
        resample_corpus(sf_small, {"en": -0.1})


def test_jsonl_shards_round_trip_and_determinism(docs_ds, tmp_path):
    from mhdb_tables2turtles_ray.pipelines.shards import write_training_shards

    out = str(tmp_path / "jl")
    summary = write_training_shards(
        docs_ds, out, id_col="doc_id", n_shards=N_SHARDS, seed=SEED,
        file_format="jsonl",
    )
    assert sorted(summary["written"]) == list(range(N_SHARDS))
    # round trip: every doc exactly once, text survives JSON encoding
    seen = {}
    for pid in range(N_SHARDS):
        path = os.path.join(out, f"part-{pid:05d}.jsonl")
        with open(path, encoding="utf-8") as f:
            for line in f:
                row = json.loads(line)
                assert set(row) == {"doc_id", "text"}
                seen[row["doc_id"]] = row["text"]
    assert set(seen) == _all_ids()
    base = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(
        base.column("doc_id").to_pylist(), base.column("text").to_pylist()
    ):
        assert seen[did] == text
    # rerun in a fresh dir: byte-identical shard files (manifest shas)
    out2 = str(tmp_path / "jl2")
    write_training_shards(
        docs_ds, out2, id_col="doc_id", n_shards=N_SHARDS, seed=SEED,
        file_format="jsonl",
    )
    assert _manifest_shas(out) == _manifest_shas(out2)
    # parquet and jsonl shard the rows identically (same permutation)
    outp = str(tmp_path / "pq")
    _write(docs_ds, outp)
    for pid in range(N_SHARDS):
        pq_ids = pq.read_table(
            os.path.join(outp, f"part-{pid:05d}.parquet"), columns=["doc_id"]
        ).column("doc_id").to_pylist()
        with open(os.path.join(out, f"part-{pid:05d}.jsonl"), encoding="utf-8") as f:
            jl_ids = [json.loads(line)["doc_id"] for line in f]
        assert pq_ids == jl_ids


def test_jsonl_resume_and_bad_format(docs_ds, tmp_path):
    from mhdb_tables2turtles_ray.pipelines.shards import write_training_shards

    out = str(tmp_path / "jl")
    write_training_shards(
        docs_ds, out, id_col="doc_id", n_shards=N_SHARDS, file_format="jsonl"
    )
    summary = write_training_shards(
        docs_ds, out, id_col="doc_id", n_shards=N_SHARDS, file_format="jsonl"
    )
    assert summary["written"] == [] and len(summary["skipped"]) == N_SHARDS
    with pytest.raises(ValueError, match="file_format"):
        write_training_shards(
            docs_ds, out, id_col="doc_id", n_shards=N_SHARDS, file_format="csv"
        )
