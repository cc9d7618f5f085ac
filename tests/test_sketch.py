"""HyperLogLog sketch: accuracy, mergeability, distributed agreement."""

from __future__ import annotations

import numpy as np

from mhdb_tables2turtles_ray.stages.sketch import HyperLogLog, approx_distinct


def test_hll_accuracy():
    hll = HyperLogLog(p=12)
    hll.add(range(10_000))
    est = hll.estimate()
    assert abs(est - 10_000) / 10_000 < 0.05, est


def test_hll_merge_equals_union():
    a, b = HyperLogLog(p=12), HyperLogLog(p=12)
    a.add(range(0, 6000))
    b.add(range(4000, 10_000))  # overlapping
    merged = a.merge(b)
    whole = HyperLogLog(p=12)
    whole.add(range(10_000))
    assert np.array_equal(merged.registers, whole.registers)


def test_hll_duplicates_dont_inflate():
    hll = HyperLogLog(p=12)
    hll.add([7] * 50_000)
    assert hll.estimate() < 3


def test_approx_distinct_dataset(ray_session):
    import ray.data

    ds = ray.data.from_items([{"u": i % 500} for i in range(20_000)]).repartition(8)
    est = approx_distinct(ds, "u", p=12)
    assert abs(est - 500) / 500 < 0.05, est


def test_approx_distinct_users_exact_side(ray_session):
    """The monitoring query's exact comparison column must equal the true
    distinct user count (now computed via the two-level distinct shape,
    never a driver-side unique() of the raw column)."""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.relational import approx_distinct_users

    sf = "/root/testdata/sf0.001"
    truth = len(
        set(pq.read_table(f"{sf}/events.parquet", columns=["user_id"]).column("user_id").to_pylist())
    )
    row = approx_distinct_users(sf).take_all()[0]
    assert row["exact_distinct"] == truth
    assert abs(row["approx_distinct"] - truth) / truth < 0.05
