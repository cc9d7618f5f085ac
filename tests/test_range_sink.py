"""Range-partitioned (globally sorted) export
(`stages/parquet_sink.py:write_range_partitioned_parquet`)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

from mhdb_tables2turtles_ray.stages.parquet_sink import (
    write_range_partitioned_parquet,
)

SF = "/root/testdata/sf0.001"


def test_global_order_and_completeness(ray_session, tmp_path):
    from mhdb_tables2turtles_ray.sources.tables import read_table

    out = str(tmp_path / "ranges")
    ds = read_table(SF, "events", columns=["event_id", "value"])
    summary = write_range_partitioned_parquet(ds, out, "value", num_partitions=8)
    assert len(summary["boundaries"]) == 7
    assert sorted(summary["written"]) == list(range(8))

    seen_vals, seen_ids = [], []
    for pid in range(8):
        t = pq.read_table(os.path.join(out, f"part-{pid:05d}.parquet"))
        v = t.column("value").to_numpy()
        # each file locally sorted
        assert (np.diff(v) >= 0).all()
        seen_vals.append(v)
        seen_ids.extend(t.column("event_id").to_pylist())
    allv = np.concatenate(seen_vals)
    # concatenating files in partition order is globally sorted
    assert (np.diff(allv) >= 0).all()
    base = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
    assert sorted(seen_ids) == sorted(base.column("event_id").to_pylist())
    assert np.allclose(np.sort(allv), np.sort(base.column("value").to_numpy()))


def test_resume_and_jsonl_variant(ray_session, tmp_path):
    from mhdb_tables2turtles_ray.sources.tables import read_table

    ds = read_table(SF, "events", columns=["event_id", "value"])
    out = str(tmp_path / "r2")
    write_range_partitioned_parquet(ds, out, "value", num_partitions=4)
    again = write_range_partitioned_parquet(ds, out, "value", num_partitions=4)
    assert again["written"] == [] and len(again["skipped"]) == 4

    jl = str(tmp_path / "jl")
    write_range_partitioned_parquet(
        ds, jl, "value", num_partitions=4, file_format="jsonl"
    )
    vals = []
    for pid in range(4):
        with open(os.path.join(jl, f"part-{pid:05d}.jsonl")) as f:
            vals.extend(json.loads(line)["value"] for line in f)
    assert (np.diff(np.array(vals)) >= 0).all()
    assert len(vals) == ds.count()


def test_boundary_reuse_and_co_partitioned_join(ray_session, tmp_path):
    """Write B with A's boundaries → identical ranges → the join runs
    one independent task per partition pair, equal to a plain merge."""
    import pandas as pd
    import ray

    from mhdb_tables2turtles_ray.stages.parquet_sink import co_partitioned_join
    from mhdb_tables2turtles_ray.sources.tables import read_table

    dir_a = str(tmp_path / "a")
    dir_b = str(tmp_path / "b")
    a_ds = read_table(SF, "events", columns=["event_id", "value"])
    b_ds = read_table(SF, "events", columns=["event_id", "user_id"])
    sa = write_range_partitioned_parquet(a_ds, dir_a, "event_id", num_partitions=6)
    sb = write_range_partitioned_parquet(
        b_ds, dir_b, "event_id", num_partitions=6, boundaries=sa["boundaries"]
    )
    assert sb["boundaries"] == sa["boundaries"]

    joined = co_partitioned_join(dir_a, dir_b, "event_id").to_pandas()
    base = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "value", "user_id"]
    ).to_pandas()
    want = base[["event_id", "value"]].merge(
        base[["event_id", "user_id"]], on="event_id"
    )
    got = joined.sort_values(["event_id"]).reset_index(drop=True)
    want = want.sort_values(["event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "value", "user_id"]], want[["event_id", "value", "user_id"]]
    )


def test_co_partitioned_join_validation(ray_session, tmp_path):
    import pytest

    from mhdb_tables2turtles_ray.stages.parquet_sink import co_partitioned_join
    from mhdb_tables2turtles_ray.sources.tables import read_table

    dir_a = str(tmp_path / "a")
    ds = read_table(SF, "events", columns=["event_id", "value"])
    write_range_partitioned_parquet(ds, dir_a, "event_id", num_partitions=4)
    # not a range export at all
    with pytest.raises(ValueError, match="_range_meta"):
        co_partitioned_join(dir_a, str(tmp_path / "nope"), "event_id")
    with pytest.raises(ValueError, match="boundaries must have"):
        write_range_partitioned_parquet(
            ds, str(tmp_path / "c"), "event_id", num_partitions=4,
            boundaries=[1.0],
        )
    # mismatched layouts (independent quantiles, different partition
    # counts) refuse to join instead of silently dropping matches
    dir_b = str(tmp_path / "b8")
    write_range_partitioned_parquet(ds, dir_b, "event_id", num_partitions=8)
    with pytest.raises(ValueError, match="different range layouts"):
        co_partitioned_join(dir_a, dir_b, "event_id")
    # wrong join key refuses
    with pytest.raises(ValueError, match="range-partitioned on"):
        co_partitioned_join(dir_a, dir_a, "value")
    # structural params pinned: a rerun with different partitioning raises
    with pytest.raises(ValueError, match="pinned at creation"):
        write_range_partitioned_parquet(ds, dir_a, "event_id", num_partitions=8)
    with pytest.raises(ValueError, match="structural params"):
        write_range_partitioned_parquet(ds, dir_a, "value", num_partitions=4)


def test_range_meta_resume_reuses_boundaries(ray_session, tmp_path, monkeypatch):
    """A resumed (or repeated) range export must NOT recompute
    quantiles — the pinned _range_meta boundaries are reused."""
    from mhdb_tables2turtles_ray.sources.tables import read_table
    from mhdb_tables2turtles_ray.stages import parquet_sink, quantiles

    out = str(tmp_path / "r")
    ds = read_table(SF, "events", columns=["event_id", "value"])
    first = write_range_partitioned_parquet(ds, out, "event_id", num_partitions=4)

    def boom(*a, **k):
        raise AssertionError("quantiles recomputed on resume")

    monkeypatch.setattr(quantiles, "exact_float_quantiles", boom)
    again = write_range_partitioned_parquet(ds, out, "event_id", num_partitions=4)
    assert again["written"] == [] and again["boundaries"] == first["boundaries"]


def test_read_range_partitioned_prunes_files(ray_session, tmp_path):
    """A band lookup reads ONLY the partitions whose range intersects
    [lo, hi] — verified by deleting every non-pruned partition file and
    reading anyway (the I/O-pruning proof, same method as the IVF
    partitioned index test)."""
    import numpy as np
    import pytest

    from mhdb_tables2turtles_ray.sources.tables import read_table
    from mhdb_tables2turtles_ray.stages.parquet_sink import (
        read_range_partitioned,
    )

    out = str(tmp_path / "pr")
    ds = read_table(SF, "events", columns=["event_id", "value"])
    write_range_partitioned_parquet(ds, out, "value", num_partitions=8)

    base = pq.read_table(f"{SF}/events.parquet", columns=["value"])
    vals = np.sort(base.column("value").to_numpy())
    lo, hi = float(vals[len(vals) // 3]), float(vals[len(vals) // 2])

    got = read_range_partitioned(out, lo, hi).to_pandas()
    # superset of the exact band (file-level pruning), no band row missing
    in_band = vals[(vals >= lo) & (vals <= hi)]
    got_band = np.sort(got[(got.value >= lo) & (got.value <= hi)].value.to_numpy())
    assert np.array_equal(got_band, in_band)

    # physically delete every partition OUTSIDE the pruned set: the read
    # must not touch them
    import json as _json

    meta = _json.load(open(os.path.join(out, "_range_meta.json")))
    bounds = np.asarray(meta["boundaries"])
    first = int(np.searchsorted(bounds, lo, side="left"))
    last = min(int(np.searchsorted(bounds, hi, side="left")), 7)
    for pid in range(8):
        if not (first <= pid <= last):
            os.remove(os.path.join(out, f"part-{pid:05d}.parquet"))
    again = read_range_partitioned(out, lo, hi).to_pandas()
    assert len(again) == len(got)
    # ...but a missing partition INSIDE the requested range raises
    with pytest.raises(ValueError, match="missing"):
        read_range_partitioned(out)
    with pytest.raises(ValueError, match="empty key range"):
        read_range_partitioned(out, hi, lo - 1e9)
