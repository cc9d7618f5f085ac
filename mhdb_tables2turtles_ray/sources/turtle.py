"""Turtle shard SOURCE — read a materialized KG back as a Dataset.

The round-trip counterpart of ``stages/materialize.py``: a KG written as
per-partition Turtle shards (+ lineage manifests) reads back into a
(subj, pred, obj) Dataset, one read task per shard (shards were sized by
the writer's ``num_partitions``, so block granularity carries over). The
parser consumes the engine's own sorted-block shard dialect
(``subj pred obj ;\\n\\t…`` blocks terminated `` .`` and separated by one
blank line — the reference ``turtle_from_dict`` format); objects may
contain spaces (language-tagged literals) but not blank lines, which the
emitter's single-line label/IRI vocabulary guarantees.

Manifest handling mirrors every other consumer of the format: a shard
whose manifest is missing or whose recorded sha256 mismatches is NOT
read (``strict=True`` raises instead of skipping — the audit mode).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..state.manifest import data_path, manifest_path, partition_done


def parse_turtle_blocks(text: str) -> pa.Table:
    """One shard's text → (subj, pred, obj) Arrow table."""
    subjs: list[str] = []
    preds: list[str] = []
    objs: list[str] = []
    for block in text.split("\n\n"):
        # tolerate trailing newlines an external tool (editor, POSIX-text
        # append) may have added after the final block — the writer
        # itself emits none
        block = block.rstrip("\n")
        if not block.strip():
            continue
        if not block.endswith(" ."):
            raise ValueError(f"malformed turtle block: {block[:80]!r}")
        subj, rest = block[:-2].split(" ", 1)
        for pair in rest.split(" ;\n\t"):
            p, o = pair.split(" ", 1)
            subjs.append(subj)
            preds.append(p)
            objs.append(o)
    return pa.table(
        {
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
        }
    )


def read_turtle_dir(
    out_dir: str, num_partitions: int | None = None, strict: bool = False
) -> ray.data.Dataset:
    """Materialized KG directory → (subj, pred, obj) Dataset.

    ``num_partitions`` defaults to scanning the directory for
    ``part-*.ttl`` shards. Shards failing manifest validation are
    skipped (or raise with ``strict=True``). ``header.ttl`` is prefix
    declarations only — never triples — and is not read.
    """
    import os

    if num_partitions is None:
        # scan BOTH data files and manifests: a shard whose data file was
        # deleted but whose manifest survives must still land in `bad`
        # (strict mode exists to catch exactly that)
        pids = set()
        for f in os.listdir(out_dir):
            if f.startswith("part-") and f.endswith(".ttl"):
                pids.add(int(f[len("part-") : -len(".ttl")]))
        mdir = os.path.join(out_dir, "_manifests")
        if os.path.isdir(mdir):
            for f in os.listdir(mdir):
                if f.startswith("part-") and f.endswith(".json"):
                    pids.add(int(f[len("part-") : -len(".json")]))
        pids = sorted(pids)
    else:
        pids = list(range(num_partitions))

    good, bad = [], []
    for p in pids:
        (good if partition_done(out_dir, p) else bad).append(p)
    if bad and strict:
        raise ValueError(
            f"{len(bad)} shard(s) fail manifest validation in {out_dir}: "
            f"{[manifest_path(out_dir, p) for p in bad[:3]]}…"
        )

    paths = [data_path(out_dir, p) for p in good]
    if not paths:
        # every shard skipped (or an empty dir): honor the documented
        # skip contract with an empty, well-schema'd Dataset instead of
        # read_binary_files' unrelated "must provide at least one path"
        return ray.data.from_arrow(parse_turtle_blocks(""))
    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_turtle_blocks(payload.decode("utf-8"))
            for payload in batch.column("bytes").to_pylist()
        ]
        return (
            pa.concat_tables(tables)
            if tables
            else parse_turtle_blocks("")
        )

    return files.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
