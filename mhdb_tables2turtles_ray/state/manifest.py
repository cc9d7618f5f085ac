"""Per-partition lineage manifests + checkpointed resume.

The reference reruns from scratch on any failure (no checkpointing,
SURVEY.md §4); at 10^12-file scale output must be resumable. Layout:

    out_dir/
      part-00007.ttl             # one shard per deterministic partition id
      _manifests/part-00007.json # written AFTER the data file, atomically

A partition is "done" iff its manifest exists, parses, and the sha256 it
records matches the data file on disk. Writers write to a temp name in
the same directory and ``os.rename`` (atomic on POSIX) — data file
first, manifest last — so a killed run can never leave a manifest for a
partial shard. On resume the driver skips done partitions entirely (the
filter happens before the shuffle, so finished work costs nothing).
"""

from __future__ import annotations

import hashlib
import json
import os


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_manifests", f"part-{pid:05d}.json")


def data_path(out_dir: str, pid: int, ext: str = ".ttl") -> str:
    return os.path.join(out_dir, f"part-{pid:05d}{ext}")


def partition_done(out_dir: str, pid: int, ext: str = ".ttl") -> bool:
    mpath = manifest_path(out_dir, pid)
    dpath = data_path(out_dir, pid, ext)
    if not (os.path.exists(mpath) and os.path.exists(dpath)):
        return False
    try:
        with open(mpath) as f:
            meta = json.load(f)
        with open(dpath, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        return meta.get("sha256") == digest
    except (json.JSONDecodeError, OSError):
        return False


def partition_present(out_dir: str, pid: int, ext: str = ".ttl") -> bool:
    """Presence-level check: manifest exists and parses, data file
    exists — NO sha256 re-read. For readers that prune to a few
    partitions (:func:`..stages.parquet_sink.read_range_partitioned`)
    or visit every partition on the driver before fanning out
    (:func:`..stages.parquet_sink.co_partitioned_join`), where hashing
    would read the data bytes once on the driver only for the read
    tasks to read them again; a corrupt file still fails loudly inside
    its read task. Use :func:`partition_done` when integrity (not just
    presence) is the contract, e.g. deciding what a resumed WRITE may
    skip."""
    try:
        with open(manifest_path(out_dir, pid)) as f:
            json.load(f)
    except (OSError, ValueError):
        return False
    return os.path.exists(data_path(out_dir, pid, ext))


def completed_partitions(
    out_dir: str, num_partitions: int, ext: str = ".ttl"
) -> set[int]:
    return {p for p in range(num_partitions) if partition_done(out_dir, p, ext)}


def write_partition_atomic(out_dir: str, pid: int, text: str, meta: dict) -> dict:
    """Write one shard + its manifest atomically; returns the manifest."""
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    payload = text.encode("utf-8")
    digest = hashlib.sha256(payload).hexdigest()

    dpath = data_path(out_dir, pid)
    tmp = dpath + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, dpath)

    manifest = {
        "pid": pid,
        "sha256": digest,
        "bytes": len(payload),
        **meta,
    }
    mpath = manifest_path(out_dir, pid)
    tmp = mpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, mpath)
    return manifest


def finalize_partition_atomic(
    out_dir: str, pid: int, tmp_path: str, meta: dict, ext: str
) -> dict:
    """Promote an already-written temp data file: rename into place
    (atomic on POSIX), hash it, THEN write the manifest — same
    data-first/manifest-last protocol as :func:`write_partition_atomic`,
    for sinks whose serializer writes files itself (e.g. parquet)."""
    dpath = data_path(out_dir, pid, ext)
    os.rename(tmp_path, dpath)
    with open(dpath, "rb") as f:
        payload = f.read()
    manifest = {
        "pid": pid,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "bytes": len(payload),
        **meta,
    }
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    mpath = manifest_path(out_dir, pid)
    tmp = mpath + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, mpath)
    return manifest
