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


def test_build_key_filter_threshold_switch(ray_session):
    """Under the threshold → exact ndarray; over it → distributed Bloom
    whose membership is a superset of the exact keys (no false negatives)
    with a tiny FP rate."""
    import ray.data

    from mhdb_tables2turtles_ray.stages.semijoin import BloomFilter, build_key_filter

    keys = [{"k": i} for i in range(0, 4000, 2)]  # 2000 distinct, some dup'd
    ds = ray.data.from_items(keys + keys[:100]).repartition(4)

    exact = build_key_filter(ds, "k", exact_threshold=10_000)
    assert isinstance(exact, np.ndarray)
    assert set(exact.tolist()) == set(range(0, 4000, 2))

    bloom = build_key_filter(ds, "k", exact_threshold=10)
    assert isinstance(bloom, BloomFilter)
    assert bloom.contains(exact).all()  # no false negatives vs exact set
    non_members = np.arange(100_000, 150_000, dtype=np.int64)
    assert bloom.contains(non_members).mean() < 0.01

    # exact_threshold=None forces exact regardless of size (anti joins)
    forced = build_key_filter(ds, "k", exact_threshold=None)
    assert isinstance(forced, np.ndarray)


def test_orders_semi_bloom_superset(ray_session):
    """orders_semi_join with the Bloom path forced is a superset of the
    exact result; anti stays exact even when the threshold would trip."""
    from mhdb_tables2turtles_ray.pipelines.relational import orders_semi_join

    sf = "/root/testdata/sf0.001"
    exact = {r["o_orderkey"] for r in orders_semi_join(sf).take_all()}
    bloom = {r["o_orderkey"] for r in orders_semi_join(sf, exact_threshold=1).take_all()}
    assert exact <= bloom
    assert len(bloom) <= len(exact) * 1.01 + 5  # fpp-bounded slack

    anti_forced = {
        r["o_orderkey"]
        for r in orders_semi_join(sf, anti=True, exact_threshold=1).take_all()
    }
    anti_default = {
        r["o_orderkey"] for r in orders_semi_join(sf, anti=True).take_all()
    }
    assert anti_forced == anti_default  # anti ignores the threshold: exact


def test_shuffle_hash_join(ray_session):
    """Both-sides-big shuffle join: inner and left semantics, duplicate
    keys on both sides (cartesian within key), missing keys."""
    import pandas as pd
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import hash_join

    left = ray.data.from_items(
        [{"k": 1, "a": "l1"}, {"k": 1, "a": "l1b"}, {"k": 2, "a": "l2"},
         {"k": 3, "a": "l3"}]
    ).repartition(3)
    right = ray.data.from_items(
        [{"k": 1, "b": "r1"}, {"k": 2, "b": "r2"}, {"k": 2, "b": "r2b"},
         {"k": 9, "b": "r9"}]
    ).repartition(2)

    inner = hash_join(left, right, on="k", left_cols=["a"], right_cols=["b"],
                      num_buckets=8)
    got = {(r["k"], r["a"], r["b"]) for r in inner.take_all()}
    assert got == {
        (1, "l1", "r1"), (1, "l1b", "r1"),
        (2, "l2", "r2"), (2, "l2", "r2b"),
    }

    left_j = hash_join(left, right, on="k", left_cols=["a"], right_cols=["b"],
                       num_buckets=8, how="left")
    df = pd.DataFrame(left_j.take_all())
    assert len(df) == 5  # 4 inner matches + the unmatched k=3 row
    k3 = df[df["k"] == 3]
    assert len(k3) == 1 and k3["b"].isna().all()

    import pytest

    with pytest.raises(ValueError):
        hash_join(left, right, on="k", left_cols=["a"], right_cols=["b"],
                  how="cross")


def test_shuffle_hash_join_right_and_outer(ray_session):
    """right/outer semantics across buckets: unmatched rows from the
    nullable side(s) emit exactly once with NaN fills, and integer
    columns from a nullable side are float64 in EVERY bucket (consistent
    block schemas). Equality is pinned against pandas' own merge on the
    same data."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import (
        auto_join,
        hash_join,
    )

    ldf = pd.DataFrame({"k": [1, 1, 2, 3], "a": [10, 11, 20, 30]})
    rdf = pd.DataFrame({"k": [1, 2, 2, 9], "b": [100, 200, 201, 900]})
    left = ray.data.from_pandas(ldf).repartition(3)
    right = ray.data.from_pandas(rdf).repartition(2)

    for how in ("right", "outer"):
        got = (
            pd.DataFrame(
                hash_join(left, right, on="k", left_cols=["a"],
                          right_cols=["b"], num_buckets=8, how=how).take_all()
            )
            .sort_values(["k", "a", "b"], na_position="last")
            .reset_index(drop=True)
        )
        exp = (
            ldf.merge(rdf, on="k", how=how)[["k", "a", "b"]]
            .sort_values(["k", "a", "b"], na_position="last")
            .reset_index(drop=True)
        )
        exp["a"] = exp["a"].astype(np.float64)
        if how == "outer":
            exp["b"] = exp["b"].astype(np.float64)
        pd.testing.assert_frame_equal(got, exp, check_dtype=True)

    # auto_join routes right/outer to the shuffle path even under the
    # broadcast threshold — same rows as hash_join
    oj = pd.DataFrame(
        auto_join(left, right, on="k", left_cols=["a"], right_cols=["b"],
                  how="outer", broadcast_threshold=10**6).take_all()
    )
    assert len(oj) == len(ldf.merge(rdf, on="k", how="outer"))
    assert oj.loc[oj["k"] == 9, "a"].isna().all()
    assert oj.loc[oj["k"] == 3, "b"].isna().all()

    # salting is semantically invalid for right/outer: loud rejection
    with pytest.raises(ValueError, match="phantom"):
        hash_join(left, right, on="k", left_cols=["a"], right_cols=["b"],
                  how="outer", hot_keys=[1])


def test_shuffle_hash_join_left_schema_consistent_blocks(ray_session):
    """A left join whose unmatched rows all land in ONE bucket must
    still emit float64 right-side columns from every bucket — the
    to_arrow conversion across mixed int64/float64 blocks is exactly
    what diverging per-bucket dtypes break."""
    import numpy as np
    import pandas as pd
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import hash_join

    # many matched keys + one unmatched key: with 8 buckets the matched
    # buckets would emit int64 `b` without normalization
    ldf = pd.DataFrame({"k": list(range(40)), "a": list(range(40))})
    rdf = pd.DataFrame({"k": list(range(39)), "b": list(range(39))})
    out = hash_join(
        ray.data.from_pandas(ldf).repartition(4),
        ray.data.from_pandas(rdf).repartition(4),
        on="k", left_cols=["a"], right_cols=["b"], num_buckets=8, how="left",
    )
    t = out.to_pandas()
    assert t["b"].dtype == np.float64
    assert len(t) == 40 and t["b"].isna().sum() == 1


def test_shuffle_hash_join_salted_matches_unsalted(ray_session):
    """Hot-key salting changes task balance only — the joined rows are
    identical to the unsalted join (hot left rows spread over salt
    sub-buckets, hot right rows replicated into each)."""
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import hash_join

    # key 7 is hot: 50 left rows, 3 right rows
    left = ray.data.from_items(
        [{"k": 7, "a": f"h{i}"} for i in range(50)]
        + [{"k": 1, "a": "c1"}, {"k": 2, "a": "c2"}]
    ).repartition(4)
    right = ray.data.from_items(
        [{"k": 7, "b": f"r{j}"} for j in range(3)] + [{"k": 2, "b": "rc"}]
    ).repartition(2)

    plain = {
        (r["k"], r["a"], r["b"])
        for r in hash_join(
            left, right, on="k", left_cols=["a"], right_cols=["b"], num_buckets=8
        ).take_all()
    }
    salted = {
        (r["k"], r["a"], r["b"])
        for r in hash_join(
            left, right, on="k", left_cols=["a"], right_cols=["b"],
            num_buckets=8, hot_keys=[7], salt=4,
        ).take_all()
    }
    assert salted == plain
    assert len(plain) == 150 + 1  # 50×3 hot matches + the k=2 match

    # left join with salting keeps unmatched rows exactly once
    lj = hash_join(
        left, right, on="k", left_cols=["a"], right_cols=["b"],
        num_buckets=8, how="left", hot_keys=[7], salt=4,
    ).take_all()
    assert sum(1 for r in lj if r["k"] == 1) == 1


def test_auto_join_strategy_switch(ray_session):
    """auto_join picks broadcast at-or-under the threshold and the
    shuffle join above it — identical rows either way, both semantics."""
    import pandas as pd
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import auto_join

    left = ray.data.from_items(
        [{"k": 1, "a": "l1"}, {"k": 1, "a": "l1b"}, {"k": 2, "a": "l2"},
         {"k": 3, "a": "l3"}]
    ).repartition(3)
    right = ray.data.from_items(
        [{"k": 1, "b": "r1"}, {"k": 2, "b": "r2"}, {"k": 2, "b": "r2b"},
         {"k": 9, "b": "r9"}]
    ).repartition(2)

    for how, expect_len in (("inner", 4), ("left", 5)):
        broadcast = auto_join(
            left, right, on="k", left_cols=["a"], right_cols=["b"],
            how=how, broadcast_threshold=1_000,
        )
        shuffled = auto_join(
            left, right, on="k", left_cols=["a"], right_cols=["b"],
            how=how, broadcast_threshold=0, num_buckets=8,
        )
        b = pd.DataFrame(broadcast.take_all()).sort_values(["k", "a", "b"]).reset_index(drop=True)
        s = pd.DataFrame(shuffled.take_all()).sort_values(["k", "a", "b"]).reset_index(drop=True)
        assert len(b) == expect_len
        pd.testing.assert_frame_equal(b, s)


def test_detect_hot_keys(ray_session):
    """A key holding ~half the rows is detected; uniform keys are not;
    empty input yields no keys."""
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import (
        auto_join,
        detect_hot_keys,
        hash_join,
    )

    rows = [{"k": 7, "a": "hot"}] * 500 + [
        {"k": i, "a": "cold"} for i in range(100)
    ]
    ds = ray.data.from_items(rows).repartition(4)
    assert detect_hot_keys(ds, "k", hot_fraction=0.1) == [7]
    uniform = ray.data.from_items(
        [{"k": i % 50, "a": "x"} for i in range(500)]
    ).repartition(4)
    assert detect_hot_keys(uniform, "k", hot_fraction=0.2) == []

    # detected hot keys drive a salted join that matches the unsalted one
    right = ray.data.from_items(
        [{"k": i, "b": f"r{i}"} for i in range(100)] + [{"k": 7, "b": "r7b"}]
    )
    hot = detect_hot_keys(ds, "k", hot_fraction=0.1)
    salted = hash_join(ds, right, on="k", left_cols=["a"], right_cols=["b"],
                       num_buckets=16, hot_keys=hot, salt=4)
    plain = auto_join(ds, right, on="k", left_cols=["a"], right_cols=["b"],
                      broadcast_threshold=0, num_buckets=16)
    import pandas as pd

    s = pd.DataFrame(salted.take_all()).sort_values(["k", "a", "b"]).reset_index(drop=True)
    p = pd.DataFrame(plain.take_all()).sort_values(["k", "a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, p)


def test_detect_hot_keys_preserves_64bit_keys(ray_session):
    """Integer keys survive exactly (no float64 coercion): a hot key
    above 2^53 comes back as the exact Python int."""
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import detect_hot_keys

    big = (1 << 62) + 12345
    rows = [{"k": big, "a": 1}] * 300 + [{"k": (1 << 62) + i, "a": 1} for i in range(50)]
    ds = ray.data.from_items(rows).repartition(3)
    hot = detect_hot_keys(ds, "k", hot_fraction=0.2)
    assert hot == [big] and isinstance(hot[0], int)


def test_shuffle_hash_join_empty_side(ray_session):
    """An empty (zero-row) side joins cleanly for every how — and the
    inner path never pays a schema() fetch for the dtype map."""
    import pandas as pd
    import ray.data

    from mhdb_tables2turtles_ray.stages.shuffle_join import hash_join

    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "a": [10, 20]}))
    right = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series([], dtype="int64"),
                      "b": pd.Series([], dtype="int64")})
    )
    assert hash_join(left, right, on="k", left_cols=["a"],
                     right_cols=["b"], num_buckets=4).count() == 0
    lj = pd.DataFrame(
        hash_join(left, right, on="k", left_cols=["a"], right_cols=["b"],
                  num_buckets=4, how="left").take_all()
    )
    assert len(lj) == 2 and lj["b"].isna().all()
