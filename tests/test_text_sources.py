"""JSONL / CSV sources (`sources/text_files.py`): round-trip with the
jsonl shard sink, rename/prune/validate contract, loud failures."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from mhdb_tables2turtles_ray.sources.text_files import (
    read_csv_table,
    read_jsonl_documents,
)

SF = "/root/testdata/sf0.001"


def test_round_trips_own_jsonl_shards(ray_session, tmp_path):
    from mhdb_tables2turtles_ray.pipelines.shards import write_training_shards
    from mhdb_tables2turtles_ray.sources.tables import read_table

    out = str(tmp_path / "jl")
    write_training_shards(
        read_table(SF, "documents", columns=["doc_id", "text"]),
        out, id_col="doc_id", n_shards=4, file_format="jsonl",
    )
    paths = [os.path.join(out, f"part-{p:05d}.jsonl") for p in range(4)]
    back = read_jsonl_documents(paths).to_pandas().set_index("doc_id")
    base = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert len(back) == base.num_rows
    for did, text in zip(
        base.column("doc_id").to_pylist(), base.column("text").to_pylist()
    ):
        assert back.loc[did, "text"] == text


def test_jsonl_rename_prune_and_feeds_operators(ray_session, tmp_path):
    p = tmp_path / "ext.jsonl"
    with open(p, "w", encoding="utf-8") as f:
        for i, body in enumerate(["the quick fox", "der alte Hund", ""]):
            f.write(json.dumps({"id": i, "content": body, "junk": "x"}) + "\n")
    ds = read_jsonl_documents(
        str(p), columns=["doc_id", "text"],
        rename={"id": "doc_id", "content": "text"},
    )
    df = ds.to_pandas()
    assert list(df.columns) == ["doc_id", "text"]
    assert df.loc[df.doc_id == 1, "text"].iloc[0] == "der alte Hund"
    # the normalized dataset drops straight into a text operator
    from mhdb_tables2turtles_ray.pipelines.bpe import word_counts

    words, counts, _ = word_counts(SF, ds=ds)
    assert "fox" in words and "Hund" in words


def test_jsonl_missing_required_fails_loudly(ray_session, tmp_path):
    p = tmp_path / "bad.jsonl"
    with open(p, "w", encoding="utf-8") as f:
        f.write(json.dumps({"doc_id": 1, "body": "no text field"}) + "\n")
    with pytest.raises(ValueError, match="text"):
        read_jsonl_documents(str(p))
    with pytest.raises(ValueError, match="rename source columns"):
        read_jsonl_documents(str(p), rename={"nope": "text"})


def test_csv_table_reads_and_validates(ray_session, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("k,v\na,1\nb,2\n")
    df = read_csv_table(str(p)).to_pandas()
    assert list(df.columns) == ["k", "v"] and len(df) == 2
    assert df.v.sum() == 3
    pruned = read_csv_table(str(p), columns=["v"]).to_pandas()
    assert list(pruned.columns) == ["v"]
    with pytest.raises(ValueError, match="missing"):
        read_csv_table(str(p), columns=["nope"])


def test_jsonl_directory_read_skips_manifests(ray_session, tmp_path):
    """Reading the sink's output DIRECTORY must ignore _manifests/*.json
    sidecars — only .jsonl shard files feed the corpus."""
    from mhdb_tables2turtles_ray.pipelines.shards import write_training_shards
    from mhdb_tables2turtles_ray.sources.tables import read_table

    out = str(tmp_path / "jl")
    write_training_shards(
        read_table(SF, "documents", columns=["doc_id", "text"]),
        out, id_col="doc_id", n_shards=4, file_format="jsonl",
    )
    ds = read_jsonl_documents(out)  # the directory, not file paths
    df = ds.to_pandas()
    assert set(df.columns) == {"doc_id", "text"}
    base_ids = set(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_pylist()
    )
    assert len(df) == len(base_ids) and set(df.doc_id) == base_ids


def test_mixed_format_directory_refused(ray_session, tmp_path):
    from mhdb_tables2turtles_ray.pipelines.shards import write_training_shards
    from mhdb_tables2turtles_ray.sources.tables import read_table

    out = str(tmp_path / "mix")
    ds = read_table(SF, "documents", columns=["doc_id", "text"])
    write_training_shards(ds, out, id_col="doc_id", n_shards=4)
    with pytest.raises(ValueError, match="separate directory"):
        write_training_shards(
            ds, out, id_col="doc_id", n_shards=4, file_format="jsonl"
        )
