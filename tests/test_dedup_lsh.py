"""MinHash-LSH shuffle-shape variants must agree exactly.

carry_sig=True ships full signatures through the band shuffle
(single-pass); carry_sig=False ships 16-byte band rows and verifies
candidates against recomputed signatures (two-pass). Signatures are
deterministic, so both shapes must produce the identical pair set with
identical estimates.
"""

from __future__ import annotations

import numpy as np

from mhdb_tables2turtles_ray.pipelines.dedup import MinHasher, minhash_lsh_pairs

SF = "/root/testdata/sf0.001"


def _pairs(ds):
    return {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in ds.take_all()
    }


def test_carry_sig_variants_identical(ray_session):
    single = _pairs(minhash_lsh_pairs(SF, carry_sig=True))
    two_pass = _pairs(minhash_lsh_pairs(SF, carry_sig=False))
    assert single == two_pass
    assert len(single) > 0  # the testdata does contain near-dups


def test_two_pass_handles_no_candidates(ray_session):
    # threshold can't create candidates out of nothing: crank bands down
    # so bucket collisions require near-identical docs, and verify with
    # an impossible threshold — the two-pass path must return an empty,
    # well-schema'd Dataset (the empty-candidate guard).
    out = minhash_lsh_pairs(SF, threshold=1.01, carry_sig=False)
    rows = out.take_all()
    assert rows == []
    schema = out.schema()
    # an all-filtered groupby can't infer a schema (None); when one is
    # present it must be the pair schema
    assert schema is None or set(schema.names) == {"doc_a", "doc_b", "est_jaccard"}


def test_band_row_width():
    """The light band rows must NOT carry signatures (that's the point)."""
    import pyarrow as pa

    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["a b c d e", "a b c d e"]})
    light = MinHasher(mode="bands_light")(batch)
    assert "sig" not in light.schema.names
    heavy = MinHasher(mode="bands")(batch)
    assert "sig" in heavy.schema.names
    sigs = MinHasher(mode="sigs")(batch)
    assert sigs.num_rows == 2 and "sig" in sigs.schema.names
    s = np.asarray(sigs.column("sig").to_pylist())
    assert (s[0] == s[1]).all()  # identical text -> identical signature


def test_union_find_roots():
    from mhdb_tables2turtles_ray.pipelines.dedup import _union_find_roots

    # two chains that merge + an isolated pair; root is the component min
    roots = _union_find_roots([(5, 3), (3, 9), (20, 21), (9, 7)])
    assert roots == {5: 3, 3: 3, 9: 3, 7: 3, 20: 20, 21: 20}
    assert _union_find_roots([]) == {}


def test_dedup_keep_best_partition(ray_session):
    """Survivors + dropped = corpus; every cluster keeps exactly its
    smallest member."""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.dedup import (
        _union_find_roots,
        dedup_keep_best,
        jaccard_pairs_subset,
    )

    sf = "/root/testdata/sf0.001"
    survivors = {r["doc_id"] for r in dedup_keep_best(sf).take_all()}
    all_ids = set(
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs_subset(sf).take_all()
    ]
    roots = _union_find_roots(pairs)
    expected_dropped = {n for n, r in roots.items() if r != n}
    assert survivors == all_ids - expected_dropped
    assert {r for r in roots.values()} <= survivors  # every cluster's min kept


def test_incremental_exact_dedup(ray_session, tmp_path):
    """Increment 1 builds the index; an identical increment 2 yields
    ZERO survivors; a half-new increment keeps only the new docs; the
    index accumulates across increments."""
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.dedup import incremental_exact_dedup

    idx = str(tmp_path / "fp_index")

    def docs(items):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([i for i, _ in items], pa.int64()),
                    "text": pa.array([t for _, t in items], pa.string()),
                }
            )
        )

    batch1 = docs([(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 dups to 2
    s1 = {r["doc_id"] for r in incremental_exact_dedup(None, idx, ds=batch1).take_all()}
    assert s1 == {1, 2}  # in-batch dup of 'alpha' keeps min id

    # identical content arrives again -> everything already indexed
    batch2 = docs([(10, "alpha"), (11, "beta")])
    s2 = {r["doc_id"] for r in incremental_exact_dedup(None, idx, ds=batch2).take_all()}
    assert s2 == set()

    # half-new increment
    batch3 = docs([(20, "beta"), (21, "gamma")])
    s3 = {r["doc_id"] for r in incremental_exact_dedup(None, idx, ds=batch3).take_all()}
    assert s3 == {21}

    # and gamma is now indexed too
    batch4 = docs([(30, "gamma")])
    s4 = {r["doc_id"] for r in incremental_exact_dedup(None, idx, ds=batch4).take_all()}
    assert s4 == set()


def test_incremental_minhash_dedup(ray_session, tmp_path):
    """Near-dup filtering against the persisted signature index: exact
    re-sends and near-identical variants of indexed docs are dropped;
    genuinely new docs survive and extend the index."""
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.dedup import incremental_minhash_dedup

    idx = str(tmp_path / "sig_index")
    CAP = 10_000  # small sidecars for the test; constant per index

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")  # high-Jaccard variant
    other = "completely different content about distributed shuffle execution plans"

    def docs(items):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([i for i, _ in items], pa.int64()),
                    "text": pa.array([t for _, t in items], pa.string()),
                }
            )
        )

    s1 = {
        r["doc_id"]
        for r in incremental_minhash_dedup(
            None, idx, ds=docs([(1, base), (2, other)]), bloom_capacity=CAP
        ).take_all()
    }
    assert s1 == {1, 2}  # empty index: everything survives

    # exact duplicate + near-duplicate + a new doc
    brand_new = "unrelated text mentioning actor pools and zero copy arrow batches"
    s2 = {
        r["doc_id"]
        for r in incremental_minhash_dedup(
            None,
            idx,
            ds=docs([(10, base), (11, near), (12, brand_new)]),
            bloom_capacity=CAP,
        ).take_all()
    }
    assert 10 not in s2  # exact re-send dropped
    assert 11 not in s2  # near-dup dropped
    assert 12 in s2      # new doc survives

    # the new doc is now indexed too
    s3 = {
        r["doc_id"]
        for r in incremental_minhash_dedup(
            None, idx, ds=docs([(20, brand_new)]), bloom_capacity=CAP
        ).take_all()
    }
    assert s3 == set()


def _docs(items):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in items], pa.int64()),
                "text": pa.array([t for _, t in items], pa.string()),
            }
        )
    )


def test_incremental_exact_dedup_bloom_threshold(ray_session, tmp_path):
    """Above the exact_threshold the seen-set switches to the distributed
    Bloom path (mirroring stages/semijoin.py) — results identical to the
    exact path at the test scale (fpp=1e-9, no expected false drops)."""
    from mhdb_tables2turtles_ray.pipelines.dedup import incremental_exact_dedup

    idx = str(tmp_path / "fp_bloom")
    s1 = {
        r["doc_id"]
        for r in incremental_exact_dedup(
            None, idx, ds=_docs([(1, "alpha"), (2, "beta")]), exact_threshold=1
        ).take_all()
    }
    assert s1 == {1, 2}
    # index holds 2 digests > threshold=1 → Bloom path on this call
    s2 = {
        r["doc_id"]
        for r in incremental_exact_dedup(
            None,
            idx,
            ds=_docs([(10, "alpha"), (11, "gamma")]),
            exact_threshold=1,
        ).take_all()
    }
    assert s2 == {11}  # indexed dup dropped through the Bloom probe
    s3 = {
        r["doc_id"]
        for r in incremental_exact_dedup(
            None, idx, ds=_docs([(20, "gamma")]), exact_threshold=1
        ).take_all()
    }
    assert s3 == set()


def test_index_meta_pins_structural_params(ray_session, tmp_path):
    """Index-structural parameters are immutable per index: a later call
    with a different num_partitions / bloom_capacity fails loudly instead
    of silently skipping 'missing' partition files."""
    import pytest

    from mhdb_tables2turtles_ray.pipelines.dedup import (
        incremental_exact_dedup,
        incremental_minhash_dedup,
    )

    idx = str(tmp_path / "fp_meta")
    incremental_exact_dedup(None, idx, ds=_docs([(1, "alpha")]), num_partitions=4)
    with pytest.raises(ValueError, match="num_partitions"):
        incremental_exact_dedup(None, idx, ds=_docs([(2, "beta")]), num_partitions=8)

    sig_idx = str(tmp_path / "sig_meta")
    incremental_minhash_dedup(
        None, sig_idx, ds=_docs([(1, "a b c d e f g")]), bloom_capacity=10_000
    )
    with pytest.raises(ValueError, match="bloom_capacity"):
        incremental_minhash_dedup(
            None, sig_idx, ds=_docs([(2, "h i j k l m n")]), bloom_capacity=20_000
        )
    with pytest.raises(ValueError, match="num_perm"):
        incremental_minhash_dedup(
            None,
            sig_idx,
            ds=_docs([(3, "o p q r s t u")]),
            bloom_capacity=10_000,
            num_perm=32,
        )


def test_connected_components(ray_session):
    """Min-label propagation equals union-find on chains (worst-case
    diameter), merging chains, cliques and isolated pairs; converges and
    raises when the iteration bound is too small."""
    import pyarrow as pa
    import pytest
    import ray.data

    from mhdb_tables2turtles_ray.pipelines.dedup import _union_find_roots
    from mhdb_tables2turtles_ray.stages.cc import connected_components

    def run(pairs, **kw):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                    "doc_b": pa.array([b for _, b in pairs], pa.int64()),
                }
            )
        ).repartition(3)
        return {
            r["node"]: r["component"]
            for r in connected_components(ds, **kw).take_all()
        }

    # a 10-chain + a triangle + an isolated pair + two merging chains
    pairs = (
        [(i, i + 1) for i in range(9)]
        + [(100, 101), (101, 102), (100, 102)]
        + [(200, 201)]
        + [(5, 3), (3, 9), (20, 21), (9, 7)]
    )
    got = run(pairs)
    expect = _union_find_roots(pairs)
    assert got == expect

    with pytest.raises(RuntimeError, match="did not converge"):
        run([(i, i + 1) for i in range(20)], max_iters=2)


def test_dedup_keep_best_distributed_matches_driver(ray_session):
    from mhdb_tables2turtles_ray.pipelines.dedup import dedup_keep_best

    sf = "/root/testdata/sf0.001"
    a = {r["doc_id"] for r in dedup_keep_best(sf).take_all()}
    b = {r["doc_id"] for r in dedup_keep_best(sf, method="distributed").take_all()}
    assert a == b and len(a) > 0


def test_connected_components_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.stages.cc import connected_components

    empty = ray.data.from_arrow(
        pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    )
    assert connected_components(empty).take_all() == []


def test_dedup_keep_best_lsh_scale_composition(ray_session):
    """The all-scale-paths removal (LSH pairs → distributed CC → anti
    semi-join) keeps exactly each cluster's smallest id + all
    unclustered docs, agreeing with a driver union-find over the SAME
    minhash pair set."""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.pipelines.dedup import (
        _union_find_roots,
        dedup_keep_best_lsh,
        minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.001"
    survivors = {r["doc_id"] for r in dedup_keep_best_lsh(sf).take_all()}
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(sf).take_all()
    ]
    assert pairs  # the testdata contains near-dups
    roots = _union_find_roots(pairs)
    all_ids = set(
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    expected_dropped = {n for n, r in roots.items() if r != n}
    assert survivors == all_ids - expected_dropped


def test_auto_switch_on_saturated_candidates(ray_session, caplog):
    """A dup-saturated corpus must trip the two-pass → single-pass
    auto-switch (count-then-choose): with the switch floor lowered, the
    same call yields IDENTICAL pairs to both forced shapes, and the
    decision is logged (no silent regime change)."""
    import logging

    import pyarrow as pa
    import ray

    # 60 docs in 12 near-dup families of 5 → most docs are candidates
    texts, ids = [], []
    for fam in range(12):
        base = (
            f"family {fam} shares a long common body of text that "
            f"minhash shingles will hash identically across variants"
        )
        for v in range(5):
            ids.append(fam * 5 + v)
            texts.append(base + (f" tail{v}" if v else ""))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )

    kw = dict(num_perm=32, bands=8, threshold=0.5)
    forced_single = _pairs(minhash_lsh_pairs(ds=ds, carry_sig=True, **kw))
    forced_two = _pairs(
        minhash_lsh_pairs(ds=ds, carry_sig=False, auto_switch_min=10**9, **kw)
    )
    with caplog.at_level(logging.WARNING, "mhdb_tables2turtles_ray.pipelines.dedup"):
        auto = _pairs(
            minhash_lsh_pairs(
                ds=ds, carry_sig=False, auto_switch_min=1, auto_switch_frac=0.5, **kw
            )
        )
    assert forced_single == forced_two == auto
    assert len(auto) > 0
    assert any("switching to the single-pass" in r.message for r in caplog.records)


def _planted_embedding_ds(n_clusters=6, per=4, dim=32, noise=0.01):
    import pyarrow as pa
    import ray

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((n_clusters, dim))
    vecs, ids = [], []
    for c in range(n_clusters):
        for v in range(per):
            vecs.append(centers[c] + noise * rng.standard_normal(dim))
            ids.append(c * per + v)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float64())
                ),
            }
        )
    ), n_clusters, per


def test_embedding_lsh_recovers_planted_clusters(ray_session):
    """SRP-LSH must find every within-cluster pair of tightly-planted
    near-dup embeddings (cosine ~1 -> hamming ~0 -> est ~1) and no
    cross-cluster pair at a high threshold."""
    from mhdb_tables2turtles_ray.pipelines.dedup import embedding_lsh_pairs

    ds, n_clusters, per = _planted_embedding_ds()
    rows = embedding_lsh_pairs(ds=ds, threshold=0.95).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    expected = {
        (c * per + i, c * per + j)
        for c in range(n_clusters)
        for i in range(per)
        for j in range(i + 1, per)
    }
    assert expected <= got
    # no cross-cluster pair survives the 0.95 bar (clusters ~orthogonal)
    cross = {p for p in got if p[0] // per != p[1] // per}
    assert not cross
    # estimator: within-cluster estimated cosine is near 1
    assert all(r["est_cosine"] >= 0.95 for r in rows)


def test_embedding_lsh_deterministic_and_estimator_sane(ray_session):
    from mhdb_tables2turtles_ray.pipelines.dedup import embedding_lsh_pairs

    sf = "/root/testdata/sf0.001"
    a = sorted(
        (r["doc_a"], r["doc_b"], r["est_cosine"])
        for r in embedding_lsh_pairs(sf).take_all()
    )
    b = sorted(
        (r["doc_a"], r["doc_b"], r["est_cosine"])
        for r in embedding_lsh_pairs(sf).take_all()
    )
    assert a == b  # fixed seed + deterministic hyperplanes
    for _, _, est in a:
        assert -1.0 <= est <= 1.0
