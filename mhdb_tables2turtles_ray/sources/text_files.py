"""JSONL / CSV corpus sources — the read side of external interchange.

A user migrating pipelines to this engine rarely starts from parquet:
web-scale corpora arrive as newline-delimited JSON (the LLM-training
interchange format this repo's shard sink also writes) or CSV exports.
These wrappers turn those into the same (doc_id, text, ...) Datasets
every operator consumes, with the repo's read rules applied at the
source: column pruning at the read (``columns``), schema validation
that FAILS LOUDLY on a missing required column (a typo'd field name
must not become a null column that silently empties a funnel), and an
optional rename map so arbitrary field names ("id", "content",
"body") normalize to the engine's (doc_id, text) convention without a
separate pass.

Scale shape: both ride Ray Data's native file readers — one read task
per file/fragment, streamed blocks, no driver materialization. Ray's
JSON reader parses whole files (not splittable mid-file), so shard
your JSONL into many files (this repo's own jsonl sink always does);
CSV fragments split by block.
"""

from __future__ import annotations

import ray.data


def _normalize(
    ds: ray.data.Dataset,
    columns: list[str] | None,
    rename: dict[str, str] | None,
    required: tuple[str, ...],
    source: str,
) -> ray.data.Dataset:
    """Shared post-read step: rename → prune → validate required."""
    schema = ds.schema()
    names = list(schema.names) if schema is not None else []
    if rename:
        missing = [c for c in rename if c not in names]
        if missing:
            raise ValueError(
                f"{source}: rename source columns {missing} not in input "
                f"columns {names}"
            )
        ds = ds.rename_columns(rename)
        names = [rename.get(n, n) for n in names]
    want = columns if columns is not None else names
    absent = [c for c in set(want) | set(required) if c not in names]
    if absent:
        raise ValueError(
            f"{source}: required columns {sorted(absent)} missing from "
            f"input columns {names}"
        )
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def read_jsonl_documents(
    paths: str | list[str],
    columns: list[str] | None = None,
    rename: dict[str, str] | None = None,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> ray.data.Dataset:
    """Newline-delimited JSON file(s)/dir → Dataset, normalized to the
    engine's document convention. ``rename`` maps source field names
    (e.g. ``{"id": "doc_id", "content": "text"}``) BEFORE pruning and
    validation; ``required`` names the columns that must exist after
    renaming (loud failure, not a silent null column). Round-trips the
    jsonl shards this repo's own sink writes (pinned by test) —
    including a shard DIRECTORY: only ``.jsonl`` files are read, so the
    sink's ``_manifests/*.json`` sidecars never pollute the corpus."""
    ds = ray.data.read_json(paths, file_extensions=["jsonl"])
    return _normalize(ds, columns, rename, required, "read_jsonl_documents")


def read_csv_table(
    paths: str | list[str],
    columns: list[str] | None = None,
    rename: dict[str, str] | None = None,
    required: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """CSV file(s)/dir → Dataset with the same rename → prune →
    validate contract as :func:`read_jsonl_documents` (``required``
    defaults to empty — CSV inputs are general tables, not necessarily
    documents)."""
    ds = ray.data.read_csv(paths)
    return _normalize(ds, columns, rename, required, "read_csv_table")
