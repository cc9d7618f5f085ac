"""Resumable partitioned-parquet sink: atomic writes, manifest-gated
resume, corrupt-shard invalidation, round-trip."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def events_ds(ray_session):
    from mhdb_tables2turtles_ray.sources.tables import read_table

    return read_table(
        "/root/testdata/sf0.001", "events", columns=["event_id", "user_id", "value"]
    )


def _rows(sf="/root/testdata/sf0.001"):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/events.parquet", columns=["event_id"])
    return set(t.column("event_id").to_pylist())


def test_write_read_round_trip(events_ds, tmp_path):
    from mhdb_tables2turtles_ray.stages.parquet_sink import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )

    out = str(tmp_path / "sink")
    summary = write_partitioned_parquet(events_ds, out, "user_id", num_partitions=8)
    assert sorted(summary["written"]) == list(range(8))
    assert summary["n_rows"] == len(_rows())

    back = read_partitioned_parquet(out, 8)
    assert {r["event_id"] for r in back.take_all()} == _rows()


def test_resume_skips_done_and_rebuilds_corrupt(events_ds, tmp_path):
    from mhdb_tables2turtles_ray.stages.parquet_sink import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )

    out = str(tmp_path / "sink")
    write_partitioned_parquet(events_ds, out, "user_id", num_partitions=8)

    # full resume: nothing pending, nothing rewritten
    again = write_partitioned_parquet(events_ds, out, "user_id", num_partitions=8)
    assert again["written"] == [] and sorted(again["skipped"]) == list(range(8))

    # corrupt one shard's bytes -> its manifest hash no longer matches ->
    # exactly that partition is rebuilt
    victim = os.path.join(out, "part-00003.parquet")
    with open(victim, "ab") as f:
        f.write(b"CORRUPTION")
    third = write_partitioned_parquet(events_ds, out, "user_id", num_partitions=8)
    assert third["written"] == [3]
    assert sorted(third["skipped"]) == [0, 1, 2, 4, 5, 6, 7]

    back = read_partitioned_parquet(out, 8)
    assert {r["event_id"] for r in back.take_all()} == _rows()


def test_partition_present_vs_done(events_ds, tmp_path):
    """partition_present is presence-level (manifest parses + data file
    exists, no hashing): a byte-corrupt shard is still PRESENT but no
    longer DONE — the split that lets pruned reads skip the sha256
    sweep while resume still rebuilds corruption."""
    from mhdb_tables2turtles_ray.stages.parquet_sink import (
        write_partitioned_parquet,
    )
    from mhdb_tables2turtles_ray.state.manifest import (
        manifest_path,
        partition_done,
        partition_present,
    )

    out = str(tmp_path / "sink")
    write_partitioned_parquet(events_ds, out, "user_id", num_partitions=4)
    assert all(partition_present(out, p, ext=".parquet") for p in range(4))

    with open(os.path.join(out, "part-00001.parquet"), "ab") as f:
        f.write(b"CORRUPTION")
    assert partition_present(out, 1, ext=".parquet")  # still present...
    assert not partition_done(out, 1, ext=".parquet")  # ...but not done

    # an unparseable manifest fails BOTH checks
    with open(manifest_path(out, 2), "w") as f:
        f.write("{not json")
    assert not partition_present(out, 2, ext=".parquet")
    # a missing data file fails presence even with a good manifest
    os.remove(os.path.join(out, "part-00000.parquet"))
    assert not partition_present(out, 0, ext=".parquet")


def test_partitioning_is_by_key(events_ds, tmp_path):
    """All rows of a user land in exactly one partition file."""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.stages.parquet_sink import (
        write_partitioned_parquet,
    )

    out = str(tmp_path / "sink")
    write_partitioned_parquet(events_ds, out, "user_id", num_partitions=8)
    seen: dict[int, int] = {}
    for p in range(8):
        t = pq.read_table(os.path.join(out, f"part-{p:05d}.parquet"))
        for u in set(t.column("user_id").to_pylist()):
            assert seen.setdefault(u, p) == p, f"user {u} split across partitions"
