"""Bloom filter + semi/anti join stage tests."""

from __future__ import annotations

import numpy as np

from mhdb_tables2turtles_ray.stages.semijoin import BloomFilter


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=1000, fpp=0.01)
    members = np.arange(0, 5000, 5, dtype=np.int64)  # 1000 keys
    bf.add(members)
    assert bf.contains(members).all()  # Bloom guarantee: no false negatives


def test_bloom_fpp_reasonable():
    bf = BloomFilter(capacity=1000, fpp=0.01)
    bf.add(np.arange(1000, dtype=np.int64))
    probes = np.arange(10_000, 60_000, dtype=np.int64)  # all non-members
    fp_rate = bf.contains(probes).mean()
    assert fp_rate < 0.05, fp_rate


def test_semi_and_anti_partition(ray_session):
    """Semi ∪ anti = everything; semi ∩ anti = ∅; exact mode."""
    import ray
    import ray.data

    from mhdb_tables2turtles_ray.stages.semijoin import semi_join

    ds = ray.data.from_items([{"k": i} for i in range(100)]).repartition(4)
    keys = ray.put(np.array([3, 7, 11, 99], dtype=np.int64))
    semi = {r["k"] for r in semi_join(ds, "k", keys).take_all()}
    anti = {r["k"] for r in semi_join(ds, "k", keys, anti=True).take_all()}
    assert semi == {3, 7, 11, 99}
    assert semi | anti == set(range(100)) and not (semi & anti)


def test_semi_join_bloom_mode(ray_session):
    import ray
    import ray.data

    from mhdb_tables2turtles_ray.stages.semijoin import BloomFilter, semi_join

    bf = BloomFilter(capacity=10, fpp=0.001)
    bf.add(np.array([5, 50], dtype=np.int64))
    ds = ray.data.from_items([{"k": i} for i in range(100)])
    semi = {r["k"] for r in semi_join(ds, "k", ray.put(bf)).take_all()}
    assert {5, 50} <= semi  # no false negatives; FPs allowed
