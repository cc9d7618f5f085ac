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


def test_mg_compress_bound_and_merge():
    """mg_compress keeps ≤ capacity entries, undercounts each survivor
    by exactly the subtracted threshold, and a key above the
    N/(capacity+1) bound survives any merge sequence."""
    from mhdb_tables2turtles_ray.stages.sketch import mg_compress

    keys = np.array([f"k{i}" for i in range(100)])
    counts = np.arange(1, 101)[::-1].copy()  # k0:100 ... k99:1
    ck, cc = mg_compress(keys, counts, 10)
    assert len(ck) <= 10
    assert "k0" in ck and cc[list(ck).index("k0")] <= 100
    # simulate a stream in two halves, merged: the overall heavy key
    # ("hot", 60% of N) must survive with capacity 2
    import pandas as pd

    halves = [
        {"hot": 300, "a": 50, "b": 40, "c": 30},
        {"hot": 300, "d": 50, "e": 40, "f": 30},
    ]
    acc = pd.Series(dtype=np.int64)
    for h in halves:
        acc = acc.add(pd.Series(h), fill_value=0)
        if len(acc) > 2:
            k2, c2 = mg_compress(acc.index.to_numpy(), acc.to_numpy(), 2)
            acc = pd.Series(c2, index=k2)
    assert "hot" in acc.index


def test_heavy_hitter_tokens_equals_exact(ray_session, sf_small):
    """The fixed-exchange Misra-Gries path returns the SAME rows as the
    exact groupby top_tokens on the real corpus (the k-th count clears
    the N/(capacity+1) bound at this scale)."""
    from mhdb_tables2turtles_ray.pipelines.text import (
        heavy_hitter_tokens,
        top_tokens,
    )

    exact = top_tokens(sf_small, k=20).take_all()
    mg = heavy_hitter_tokens(sf_small, k=20, capacity=8192).take_all()
    assert mg == exact


def test_heavy_hitter_tokens_small_capacity_skew(ray_session, tmp_path):
    """With capacity far below the vocabulary, heavily-skewed tokens are
    still returned with EXACT counts (the verification pass counts
    candidates exactly; nothing rides the decremented estimates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.text import heavy_hitter_tokens

    rng = np.random.default_rng(7)
    docs = []
    for i in range(60):
        toks = ["hot"] * 40 + ["warm"] * 20 + [
            f"rare{rng.integers(0, 5000)}" for _ in range(10)
        ]
        docs.append(" ".join(toks))
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(60), pa.int64()),
             "text": pa.array(docs, pa.string())}
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = heavy_hitter_tokens(str(tmp_path), k=2, capacity=16).take_all()
    assert out[0] == {"token": "hot", "n": 60 * 40}
    assert out[1] == {"token": "warm", "n": 60 * 20}
