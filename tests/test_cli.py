"""CLI (`python -m mhdb_tables2turtles_ray build`) end-to-end in a
fresh subprocess with its own Ray session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_build_validate_and_resume(tmp_path):
    out_dir = str(tmp_path / "kg")
    first = _run(
        [
            "build",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out_dir,
            "--partitions", "4",
            "--validate",
            "--num-cpus", "4",
        ]
    )
    assert first["n_triples"] > 0
    assert first["validation"]["shards"] == len(first["written"])
    assert first["validation"]["triples"] == first["n_triples"]

    second = _run(
        [
            "build",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out_dir,
            "--partitions", "4",
            "--num-cpus", "4",
        ]
    )
    assert second["written"] == []
    assert sorted(second["skipped"]) == sorted(first["written"])


def test_cli_export_and_resume(tmp_path):
    out_dir = str(tmp_path / "exp")
    args = [
        "export",
        "--query", "text_token_counts",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out_dir,
        "--key", "doc_id",
        "--partitions", "4",
        "--num-cpus", "4",
    ]
    first = _run(args)
    assert first["n_rows"] == 500 and sorted(first["written"]) == [0, 1, 2, 3]
    second = _run(args)  # resume: everything already done
    assert second["written"] == [] and sorted(second["skipped"]) == [0, 1, 2, 3]


def test_cli_export_jsonl(tmp_path):
    out_dir = str(tmp_path / "expj")
    summary = _run([
        "export",
        "--query", "text_token_counts",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out_dir,
        "--key", "doc_id",
        "--format", "jsonl",
        "--partitions", "4",
        "--num-cpus", "4",
    ])
    assert summary["n_rows"] == 500 and sorted(summary["written"]) == [0, 1, 2, 3]
    rows = []
    for p in range(4):
        with open(os.path.join(out_dir, f"part-{p:05d}.jsonl")) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == 500
    assert {r["doc_id"] for r in rows} == set(range(500))
    assert all({"doc_id", "n_tokens"} <= set(r) for r in rows)


def test_cli_export_unknown_query(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "export",
         "--query", "nope", "--sf-dir", "/root/testdata/sf0.001",
         "--out", str(tmp_path / "x"), "--key", "doc_id", "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=240,
    )
    assert out.returncode == 2
    assert "unknown query" in out.stdout


def test_cli_shard_and_resume(tmp_path):
    out_dir = str(tmp_path / "shards")
    args = [
        "shard",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out_dir,
        "--shards", "4",
        "--seed", "7",
        "--num-cpus", "4",
    ]
    first = _run(args)
    assert first["n_rows"] == 500 and sorted(first["written"]) == [0, 1, 2, 3]
    second = _run(args)  # deterministic resume: nothing to redo
    assert second["written"] == [] and sorted(second["skipped"]) == [0, 1, 2, 3]


def test_cli_export_range_partitioned(tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    out_dir = str(tmp_path / "rexp")
    summary = _run([
        "export",
        "--query", "text_token_counts",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out_dir,
        "--key", "n_tokens",
        "--range",
        "--partitions", "4",
        "--num-cpus", "4",
    ])
    assert summary["n_rows"] == 500 and len(summary["boundaries"]) == 3
    vals = np.concatenate([
        pq.read_table(os.path.join(out_dir, f"part-{p:05d}.parquet"))
        .column("n_tokens").to_numpy()
        for p in range(4)
    ])
    assert (np.diff(vals) >= 0).all() and len(vals) == 500


def test_cli_tokenize_train_and_encode(tmp_path):
    model_path = str(tmp_path / "bpe.parquet")
    trained = _run([
        "tokenize",
        "--sf-dir", "/root/testdata/sf0.001",
        "--train-merges", "25",
        "--save-model", model_path,
        "--num-cpus", "4",
    ])
    assert trained["merges"] == 25 and trained["model_path"] == model_path

    out_dir = str(tmp_path / "tok")
    encoded = _run([
        "tokenize",
        "--sf-dir", "/root/testdata/sf0.001",
        "--model", model_path,
        "--out", out_dir,
        "--partitions", "4",
        "--num-cpus", "4",
    ])
    assert encoded["n_rows"] == 500
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(out_dir, "part-00000.parquet"))
    assert set(t.schema.names) == {"doc_id", "input_ids", "n_pieces", "n_unk"}

    stats = _run([
        "tokenize",
        "--sf-dir", "/root/testdata/sf0.001",
        "--model", model_path,
        "--num-cpus", "4",
    ])
    assert stats["n_pieces"] > 0 and stats["n_unk"] == 0


def test_cli_curate_and_resume(tmp_path):
    out_dir = str(tmp_path / "cur")
    args = [
        "curate",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", out_dir,
        "--shards", "4",
        "--seed", "7",
        "--weights", '{"en": 1.5}',
        "--num-cpus", "4",
    ]
    first = _run(args)
    # funnel counts present and monotone through the filtering stages
    assert first["input"] == 500
    assert (first["input"] >= first["after_quality_lang"]
            >= first["after_exact_dedup"] >= first["after_near_dedup"])
    # weight 1.5 upsamples: the mixed stream exceeds the survivors
    assert first["after_resample"] > first["after_near_dedup"]
    assert sorted(first["shards"]["written"]) == [0, 1, 2, 3]
    assert first["shards"]["n_rows"] == first["after_resample"]

    second = _run(args)  # deterministic resume: nothing to redo
    assert second["shards"]["written"] == []
    assert sorted(second["shards"]["skipped"]) == [0, 1, 2, 3]


def test_cli_dedup_incremental_index(tmp_path):
    import pyarrow.parquet as pq

    index = str(tmp_path / "dix")
    args = [
        "dedup",
        "--sf-dir", "/root/testdata/sf0.001",
        "--index", index,
        "--num-cpus", "4",
    ]
    out1 = str(tmp_path / "surv1")
    first = _run(args + ["--out", out1, "--out-partitions", "4"])
    assert first["mode"] == "exact" and first["input"] == 500
    assert first["survivors"] == 500 and first["write"]["n_rows"] == 500
    written = pq.read_table(os.path.join(out1, "part-00000.parquet"))
    assert set(written.schema.names) == {"doc_id", "text_md5"}

    # the same increment again: every digest is now indexed; a FRESH
    # --out dir gets the explicit empty-write summary
    out2 = str(tmp_path / "surv2")
    second = _run(args + ["--out", out2])
    assert second["survivors"] == 0 and second["input"] == 500
    assert second["write"]["n_rows"] == 0

    # reusing a non-empty --out must refuse up front (the survivor
    # write is not resumable once the index ingested the increment) —
    # as must a plain FILE at the path, an empty-string path, and a
    # degenerate partition count, all BEFORE the index ingests anything
    file_path = str(tmp_path / "plain_file")
    open(file_path, "w").close()
    for extra, msg in (
        (["--out", out1], "not an empty"),
        (["--out", file_path], "not an empty"),
        (["--out", ""], "non-empty path"),
        (["--out", str(tmp_path / "fresh"), "--out-partitions", "0"],
         "--out-partitions"),
    ):
        refused = subprocess.run(
            [sys.executable, "-m", "mhdb_tables2turtles_ray", *args, *extra],
            capture_output=True, text=True, cwd=REPO, timeout=120,
        )
        assert refused.returncode != 0, extra
        assert msg in refused.stderr, extra


def test_cli_dedup_rejects_cross_mode_flags(tmp_path):
    base = [sys.executable, "-m", "mhdb_tables2turtles_ray", "dedup",
            "--sf-dir", "/root/testdata/sf0.001",
            "--index", str(tmp_path / "x"), "--num-cpus", "4"]
    out = subprocess.run(base + ["--threshold", "0.6"],
                         capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode != 0 and "--near" in out.stderr
    out = subprocess.run(base + ["--near", "--fpp", "0.01"],
                         capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode != 0 and "--near mode" in out.stderr


def test_cli_curate_semantic_and_decontam(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # identical embedding vectors for every doc: whatever survives the
    # lexical stages, the semantic stage must collapse it to ONE doc
    emb_path = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array([[1.0, 0.0, 0.0, 0.0]] * 500,
                                  pa.list_(pa.float32())),
        }),
        emb_path,
    )
    test_path = str(tmp_path / "bench.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([900], pa.int64()),
                  "text": pa.array(["held out benchmark prompt"],
                                   pa.string())}),
        test_path,
    )
    out = _run([
        "curate",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", str(tmp_path / "cur"),
        "--shards", "2",
        "--embeddings", emb_path,
        "--semantic-threshold", "0.95",
        "--decontam-test", test_path,
        "--num-cpus", "4",
    ])
    # every survivor shares one vector, so they form ONE semantic
    # cluster — but the LSH skew guard truncates each bucket to its
    # max_bucket=200 smallest ids, so exactly those 200 pair up and
    # 199 non-representatives drop (deterministic: sorted-head
    # truncation), documenting the guard's behavior at the CLI level
    assert out["after_semantic_dedup"] == out["after_near_dedup"] - 199
    assert out["after_decontam"] <= out["after_semantic_dedup"]
    assert out["shards"]["n_rows"] == out["after_resample"]


def test_cli_curate_stage_flags_require_datasets(tmp_path):
    base = [sys.executable, "-m", "mhdb_tables2turtles_ray", "curate",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(tmp_path / "x"), "--num-cpus", "4"]
    out = subprocess.run(base + ["--decontam-ngram", "6"],
                         capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode != 0 and "--decontam-test" in out.stderr
    out = subprocess.run(base + ["--semantic-threshold", "0.9"],
                         capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode != 0 and "--embeddings" in out.stderr
    # out-of-range tuning values fail loudly before Ray starts
    out = subprocess.run(
        base + ["--embeddings", "x.parquet", "--semantic-threshold", "95"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode != 0 and "(0, 1]" in out.stderr
    out = subprocess.run(
        base + ["--decontam-test", "x.parquet", "--decontam-ngram", "0"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert out.returncode != 0 and ">= 1" in out.stderr


def test_cli_curate_rejects_bad_weights(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "curate",
         "--sf-dir", "/root/testdata/sf0.001",
         "--out", str(tmp_path / "x"), "--weights", "[1, 2]",
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode != 0
    assert "--weights" in out.stderr


def test_cli_profile(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "profile",
         "--sf-dir", "/root/testdata/sf0.001", "--table", "events",
         "--columns", "event_id,user_id", "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = json.loads(out.stdout.strip().splitlines()[-1])
    by_col = {r["column"]: r for r in rows}
    assert set(by_col) == {"event_id", "user_id"}
    assert by_col["event_id"]["n"] == 1000
    assert by_col["event_id"]["n_null"] == 0
    assert by_col["event_id"]["min"] == "0" and by_col["event_id"]["max"] == "999"


def test_cli_profile_input_globs(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 2, None], pa.int64()),
                  "s": pa.array(["a", "b", None, "c"], pa.string())}),
        src,
    )
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "profile",
         "--input", src, "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = {r["column"]: r for r in
            json.loads(out.stdout.strip().splitlines()[-1])}
    assert rows["k"]["n"] == 4 and rows["k"]["n_null"] == 1
    assert rows["k"]["min"] == "1" and rows["k"]["max"] == "2"
    assert rows["s"]["n_null"] == 1
    assert rows["s"]["min"] == "a" and rows["s"]["max"] == "c"


def test_cli_profile_requires_table_with_sf_dir(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "profile",
         "--sf-dir", "/root/testdata/sf0.001", "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode != 0
    assert "--table" in out.stderr


def test_cli_tokenize_rejects_cross_mode_flags(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "tokenize",
         "--sf-dir", "/root/testdata/sf0.001",
         "--train-merges", "5", "--out", str(tmp_path / "x"),
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode != 0
    assert "--out" in out.stderr and "--train-merges mode" in out.stderr

    # a train-only flag in --model mode gets the cross-mode message,
    # NOT the misleading "requires --out" one (adding --out would just
    # trade it for a second error)
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "tokenize",
         "--sf-dir", "/root/testdata/sf0.001",
         "--model", str(tmp_path / "m.parquet"), "--min-count", "3",
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode != 0
    assert "--model mode" in out.stderr and "require(s) --out" not in out.stderr


def test_cli_curate_rejects_unknown_lang(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mhdb_tables2turtles_ray", "curate",
         "--sf-dir", "/root/testdata/sf0.001",
         "--out", str(tmp_path / "x"), "--langs", "en, zz",
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    # stripped then validated BEFORE Ray starts: 'en' survives the
    # space (the unsupported list is exactly ['zz'])
    assert out.returncode != 0
    assert "['zz'] unsupported" in out.stderr
