"""Similarity search over the ``embeddings`` table (list<float> column).

- :func:`ann_topk` — brute-force cosine top-k: the baseline. Query block
  broadcast once (``ray.put``); each task does one float64 matmul per
  batch and emits a PARTIAL top-k; a tiny groupby merges partials. At
  100 TB the partial/final split means the shuffle carries
  ``num_queries × k`` rows per block, not the corpus.
- :func:`ann_ivf` — IVF-style scale path: coarse centroids from the
  ``label`` partitions (per-batch sum/count partials merged on the
  driver — no vector shuffle), queries probe only the ``nprobe``
  nearest centroids' partitions (read-side filter), then the same
  partial/final top-k within the probed subset.
- :func:`knn_graph` — the all-docs k-NN graph: EVERY vector is a
  query (nothing can broadcast), so home-cluster indexing + nprobe
  query replication + per-cluster partial top-k + coarse-bucketed
  per-query merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.numeric import list_column_to_matrix, round_half_away
from ..sources.tables import read_table

# Flat-element budget for knn_graph's chunked in-cluster lexsort: caps
# the three flat temporaries at ~4M elements per chunk regardless of
# cluster size. Module-level so tests can force multi-chunk execution
# (cloudpickle captures the patched value at pipeline-build time).
_TOPK_CHUNK_ELEMS = 1 << 22


def _query_block(sf_dir: str, num_queries: int):
    rows = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {num_queries}")
        .take_all()
    )
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    return qids, qmat


def _partial_topk_fn(ref, k: int):
    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        vids = batch.column("vec_id").to_numpy()
        emb = list_column_to_matrix(batch.column("embedding"))
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cos = qmat @ emb.T  # (n_query, batch)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            sims = cos[qi]
            mask = vids != qids[qi]  # exclude self-match
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            order = cand_idx[
                np.lexsort((vids[cand_idx], -sims[cand_idx]))
            ][:k]
            out_q.extend([int(qids[qi])] * len(order))
            out_v.extend(vids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    return partial


def _final_topk(k: int):
    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        g["cosine"] = round_half_away(g["cosine"].to_numpy(), 6)  # FP-stable cross-engine
        return g[["query_id", "neighbor_id", "rank", "cosine"]]

    return final


def ann_topk(sf_dir: str, k: int = 5, num_queries: int = 8) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank, cosine): exact brute-force top-k."""
    qref = ray.put(_query_block(sf_dir, num_queries))
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        _partial_topk_fn(qref, k), batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


def _probe_mask(qmat: np.ndarray, centroids: np.ndarray, nprobe: int) -> np.ndarray:
    """(n_query, n_clusters) bool — which clusters each query probes
    (its ``nprobe`` nearest centroids by cosine)."""
    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    sims_qc = qmat @ cnorm.T
    mask = np.zeros(sims_qc.shape, dtype=bool)
    for qi in range(len(qmat)):
        mask[qi, np.argsort(-sims_qc[qi])[:nprobe]] = True
    return mask


def _probed_partial_fn(qref, k: int):
    """Partial top-k over batches carrying a ``cluster`` column; each
    query only scores rows of clusters it probes (vectorized mask
    lookup, no per-row Python membership test). ``qref`` → (qids, qmat,
    probe_mask)."""

    def partial(batch: pa.Table) -> pa.Table:
        ids_q, mat_q, probe_mask = ray.get(qref)
        vids = batch.column("vec_id").to_numpy()
        clusters = batch.column("cluster").to_numpy().astype(np.int64)
        emb = list_column_to_matrix(batch.column("embedding"))
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cos = mat_q @ emb.T
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            allowed = probe_mask[qi, clusters] & (vids != ids_q[qi])
            cand = np.nonzero(allowed)[0]
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((vids[cand], -cos[qi][cand]))][:k]
            out_q.extend([int(ids_q[qi])] * len(order))
            out_v.extend(vids[order].tolist())
            out_s.extend(cos[qi][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    return partial


def ann_ivf_kmeans(
    sf_dir: str,
    k: int = 5,
    num_queries: int = 8,
    n_clusters: int = 8,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """IVF with TRAINED coarse centroids (distributed Lloyd k-means,
    stages/kmeans.py) instead of the given ``label`` partitions: fit →
    assign clusters (streamed) → probe the ``nprobe`` nearest clusters
    per query → partial/final top-k within the probed subset. Pruning
    here is COMPUTE-side (the whole table is read, unprobed clusters
    filtered); :func:`ann_ivf_partitioned` is the I/O-pruned variant
    over cluster-partitioned storage. Pass ``centroids`` to reuse an
    existing fit (e.g. the shared index in :func:`ann_variants`)."""
    from ..stages.kmeans import kmeans_assign, kmeans_fit

    if centroids is None:
        base = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        centroids = kmeans_fit(base, k=n_clusters, iterations=4)
    qids, qmat = _query_block(sf_dir, num_queries)
    mask = _probe_mask(qmat, centroids, nprobe)

    assigned = kmeans_assign(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), centroids
    )
    import pyarrow.compute as pc

    probed_clusters = pa.array(np.nonzero(mask.any(axis=0))[0], pa.int64())
    probed = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t.column("cluster"), probed_clusters)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    qref = ray.put((qids, qmat, mask))
    partials = probed.map_batches(
        _probed_partial_fn(qref, k), batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


def build_ivf_index(
    sf_dir: str, index_dir: str, n_clusters: int = 8, iterations: int = 4
) -> np.ndarray:
    """Build cluster-partitioned ANN storage: fit trained coarse
    centroids, then write the embedding table through the resumable
    parquet sink with IDENTITY partitioning on the cluster id — so
    partition file ``i`` holds exactly cluster ``i``'s vectors and a
    probe can read ONLY its ``nprobe`` clusters' files. This is what
    makes IVF pay at 100 TB: ``nprobe/n_clusters`` of the bytes ever
    leave storage, instead of filtering rows after a full read.
    Centroids persist alongside (atomic write); structural params are
    pinned in ``_index_meta.json`` (see pipelines/dedup.py). Returns
    the (k, dim) centroid matrix."""
    import os

    from .dedup import _index_meta
    from ..stages.kmeans import kmeans_assign, kmeans_fit
    from ..stages.parquet_sink import write_partitioned_parquet

    _index_meta(
        index_dir,
        {"kind": "ivf_clustered", "n_clusters": n_clusters, "iterations": iterations},
    )
    base = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroid_path = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(centroid_path):
        # resume path: a crashed build continues under the SAME
        # centroids — refitting here could assign boundary vectors
        # differently (float partial-fold order) and mix partitions
        # from two assignments
        centroids = np.load(centroid_path)
    else:
        centroids = kmeans_fit(base, k=n_clusters, iterations=iterations)
        # persist BEFORE any partition write (atomic), so every
        # partition this index ever holds was assigned under one fit
        tmp = os.path.join(index_dir, f".centroids.tmp.{os.getpid()}")
        with open(tmp, "wb") as f:
            np.save(f, centroids)
        os.replace(tmp, centroid_path)
    assigned = kmeans_assign(base, centroids)
    write_partitioned_parquet(
        assigned, index_dir, "cluster", num_partitions=n_clusters, identity_key=True
    )
    return centroids


def _default_index_dir(sf_dir: str, n_clusters: int, iterations: int) -> str:
    """Deterministic per-(input, params) cache path under /tmp — repeat
    calls REUSE the index (the resumable sink skips finished partitions)
    instead of accumulating one orphan mkdtemp directory per call. The
    key includes the embeddings file's mtime+size fingerprint, so
    regenerated data at the same path gets a FRESH index rather than
    silently serving stale neighbors; the directory is per-uid so
    shared-host users don't collide on a world-shared path."""
    import hashlib
    import os

    emb = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(emb)
        fp = f"{st.st_mtime_ns}-{st.st_size}"
    except OSError:
        fp = "nofile"
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{fp}".encode("utf-8")
    ).hexdigest()[:12]
    return os.path.join(
        "/tmp",
        f"mhdb_ivf_cache-{os.getuid()}",
        f"{key}-k{n_clusters}-i{iterations}",
    )


def _load_or_build_index(
    sf_dir: str, index_dir: str, n_clusters: int, iterations: int
) -> np.ndarray:
    """Centroids of the cluster-partitioned index at ``index_dir`` —
    loading an EXISTING index validates the pinned structural params
    first (``_index_meta``), so an ``n_clusters`` mismatch fails loudly
    instead of silently excluding probed clusters ≥ the caller's count
    from the completed-partition set; builds the index when absent."""
    import os

    from .dedup import _index_meta

    from ..state.manifest import completed_partitions

    centroid_path = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(centroid_path):
        _index_meta(
            index_dir,
            {
                "kind": "ivf_clustered",
                "n_clusters": n_clusters,
                "iterations": iterations,
            },
        )
        done = completed_partitions(index_dir, n_clusters, ext=".parquet")
        if len(done) == n_clusters:
            return np.load(centroid_path)
        # interrupted build: fall through — build_ivf_index reuses the
        # persisted centroids and writes only the missing partitions
    return build_ivf_index(sf_dir, index_dir, n_clusters, iterations)


def ann_ivf_partitioned(
    sf_dir: str,
    k: int = 5,
    num_queries: int = 8,
    n_clusters: int = 8,
    nprobe: int = 2,
    index_dir: str | None = None,
    iterations: int = 4,
) -> ray.data.Dataset:
    """Trained IVF over CLUSTER-PARTITIONED storage: the probe reads
    ONLY the probed clusters' partition files (``read_parquet`` on the
    pruned path list — I/O pruning, not a post-read row filter), then
    the same partial/final top-k as :func:`ann_ivf_kmeans`. With the
    same fit parameters the result is IDENTICAL to
    :func:`ann_ivf_kmeans` (same centroids, same probed rows) — pinned
    by test. Builds the index on first use (resumable; finished
    partitions are skipped), caching under a deterministic /tmp path
    when ``index_dir`` is not given."""
    from ..state.manifest import completed_partitions, data_path

    if index_dir is None:
        index_dir = _default_index_dir(sf_dir, n_clusters, iterations)
    centroids = _load_or_build_index(sf_dir, index_dir, n_clusters, iterations)

    qids, qmat = _query_block(sf_dir, num_queries)
    mask = _probe_mask(qmat, centroids, nprobe)
    probed_clusters = sorted(np.nonzero(mask.any(axis=0))[0].tolist())
    done = completed_partitions(index_dir, n_clusters, ext=".parquet")
    missing = [c for c in probed_clusters if c not in done]
    if missing:
        # a built index is complete by construction — a probed cluster
        # failing manifest validation means corruption; silently
        # skipping it would return degraded top-k with no error
        raise ValueError(
            f"IVF index at {index_dir} is missing/corrupt partition "
            f"file(s) for probed cluster(s) {missing} — rebuild the index"
        )
    paths = [data_path(index_dir, c, ".parquet") for c in probed_clusters]

    qref = ray.put((qids, qmat, mask))
    partials = ray.data.read_parquet(paths).map_batches(
        _probed_partial_fn(qref, k), batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


def kmeans_cluster_stats(
    sf_dir: str,
    n_clusters: int = 8,
    iterations: int = 4,
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """(cluster, n_vectors, inertia) — trained-IVF observability: per-
    cluster population and summed squared distance to the centroid, the
    numbers that tell you whether the coarse index is balanced. One
    streamed pass after the fit; per-batch partials, tiny final sum."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.kmeans import kmeans_fit

    base = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if centroids is None:
        centroids = kmeans_fit(base, k=n_clusters, iterations=iterations)
    cref = ray.put(centroids)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = list_column_to_matrix(batch.column("embedding"))
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        best = d2[np.arange(len(x)), assign]
        counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
        inertia = np.bincount(assign, weights=best, minlength=len(c))
        return pa.table(
            {
                "cluster": pa.array(np.arange(len(c)), pa.int64()),
                "n_vectors": pa.array(counts),
                "inertia": pa.array(inertia, pa.float64()),
            }
        )

    partials = base.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby("cluster").aggregate(
        Sum("n_vectors", alias_name="n_vectors"),
        Sum("inertia", alias_name="inertia"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster": batch.column("cluster"),
                "n_vectors": pc.cast(batch.column("n_vectors"), pa.int64()),
                # repo-wide rule: float output boundaries round half-away
                # (DuckDB semantics), never pc.round's half-even
                "inertia": pa.array(
                    round_half_away(batch.column("inertia").to_numpy(), 3)
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def embedding_pca(
    sf_dir: str, k: int = 16, ds: ray.data.Dataset | None = None
) -> tuple[np.ndarray, np.ndarray, ray.data.Dataset]:
    """Distributed PCA over the embedding column — the dimensionality-
    reduction lever ahead of ANN (smaller vectors → cheaper matmuls and
    4×-smaller indexes on top of int8 quantization).

    Shape: one streamed pass computes per-batch (sum, X^T X, count)
    partials — fixed ``dim + dim²`` floats per batch, folded into the
    running moments under backpressure (never resident per-batch) — the
    driver eigendecomposes the dim×dim covariance (dim is small by
    construction; the DATA never leaves the cluster), then a second
    streamed pass projects every vector onto the top-``k`` components.
    Deterministic: components are sign-normalized (largest-|loading|
    coordinate positive), so results are reproducible across block
    structures. Returns (components (k, dim), explained_variance (k,),
    projected Dataset (vec_id, embedding: list<float>[k]))."""
    if ds is None:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def moments(batch: pa.Table) -> pa.Table:
        x = list_column_to_matrix(batch.column("embedding"))
        return pa.table(
            {
                "sum": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "xtx": pa.array(
                    [(x.T @ x).ravel().tolist()], pa.list_(pa.float64())
                ),
                "n": pa.array([len(x)], pa.int64()),
            }
        )

    total_sum = None
    total_xtx = None
    total_n = 0
    parts = ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for s, xtx, n in zip(
            b.column("sum").to_pylist(), b.column("xtx").to_pylist(),
            b.column("n").to_pylist(),
        ):
            s = np.asarray(s)
            if total_sum is None:
                total_sum = s
                total_xtx = np.asarray(xtx)
            else:
                total_sum = total_sum + s
                total_xtx = total_xtx + np.asarray(xtx)
            total_n += n
    if total_n == 0:
        raise ValueError("embedding_pca: empty input")
    dim = len(total_sum)
    mean = total_sum / total_n
    cov = total_xtx.reshape(dim, dim) / total_n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    components = evecs[:, order].T  # (k, dim)
    explained = evals[order]
    # deterministic sign: the largest-|loading| coordinate is positive
    for i in range(len(components)):
        j = int(np.argmax(np.abs(components[i])))
        if components[i, j] < 0:
            components[i] = -components[i]
    cref = ray.put((mean, components))

    def project(batch: pa.Table) -> pa.Table:
        m, comp = ray.get(cref)
        x = list_column_to_matrix(batch.column("embedding"))
        z = (x - m) @ comp.T
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "embedding": pa.array(z.tolist(), pa.list_(pa.float64())),
            }
        )

    projected = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return components, explained, projected


def quantize_embeddings(sf_dir: str) -> ray.data.Dataset:
    """(vec_id, scale, qvec: list<int8>) — symmetric per-vector int8
    quantization (scale = max|x| / 127), the memory-side scale lever for
    ANN: 4× smaller vectors in the object store and on the wire. One
    streamed pass, fully vectorized."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pa.Table:
        emb = list_column_to_matrix(batch.column("embedding"))
        scale = np.abs(emb).max(axis=1) / 127.0
        scale = np.maximum(scale, 1e-12)
        q = np.rint(emb / scale[:, None]).astype(np.int8)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "scale": pa.array(scale, pa.float64()),
                "qvec": pa.array(q.tolist(), pa.list_(pa.int8())),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


def ann_topk_quantized(
    sf_dir: str, k: int = 5, num_queries: int = 8
) -> ray.data.Dataset:
    """Brute-force cosine top-k over int8-DEQUANTIZED vectors — the
    quantized variant of :func:`ann_topk` (approximate by quantization
    error; recall vs the exact path is pinned by test). Same
    partial/final shape; each batch dequantizes vectorized (q × scale)
    before the matmul."""
    qids, qmat = _query_block(sf_dir, num_queries)
    qref = ray.put((qids, qmat))
    ds = quantize_embeddings(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        ids_q, mat_q = ray.get(qref)
        vids = batch.column("vec_id").to_numpy()
        scale = batch.column("scale").to_numpy()
        q = list_column_to_matrix(batch.column("qvec"), dtype=np.float64)
        emb = q * scale[:, None]
        emb = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12
        )
        cos = mat_q @ emb.T
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            mask = vids != ids_q[qi]
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((vids[cand], -cos[qi][cand]))][:k]
            out_q.extend([int(ids_q[qi])] * len(order))
            out_v.extend(vids[order].tolist())
            out_s.extend(cos[qi][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


#: full outer schema of the ann_variants monitoring union
_VARIANT_SCHEMA = (
    ("query_id", pa.int64()),
    ("neighbor_id", pa.int64()),
    ("rank", pa.int64()),
    ("cosine", pa.float64()),
    ("cluster", pa.int64()),
    ("n_vectors", pa.int64()),
    ("inertia", pa.float64()),
)


def ann_variants(sf_dir: str, k: int = 5, num_queries: int = 8) -> ray.data.Dataset:
    """Monitoring union of every APPROXIMATE ANN path (the exact path,
    :func:`ann_topk`, has its own SQL-oracled registry row): one tall
    table tagged by ``variant`` — 'ivf' (label partitions),
    'ivf_kmeans' (trained, compute-pruned), 'ivf_partitioned' (trained,
    I/O-pruned storage), 'quantized' (int8), plus 'kmeans_stats'
    carrying the trained-index observability columns (cluster,
    n_vectors, inertia; search columns null). Consolidates what were
    five separate rows-only registry entries so every oracled query
    fits under the driver's correctness gate; each variant's semantics
    stay pinned by its own tests (recall bounds, variant equality,
    probe pruning)."""

    def widen(ds: ray.data.Dataset, name: str) -> ray.data.Dataset:
        def fmt(t: pa.Table, name=name) -> pa.Table:
            cols = {"variant": pa.array([name] * t.num_rows, pa.string())}
            for col, typ in _VARIANT_SCHEMA:
                if col in t.schema.names:
                    cols[col] = pc.cast(t.column(col), typ)
                else:
                    cols[col] = pa.nulls(t.num_rows, typ)
            return pa.table(cols)

        return ds.map_batches(fmt, batch_format="pyarrow", zero_copy_batch=True)

    # ONE shared trained index powers the three kmeans-based variants
    # (fit once, reuse the cached cluster-partitioned storage) — the
    # deterministic fit makes this observationally identical to
    # independent fits, minus two redundant full fits per run
    idx = _default_index_dir(sf_dir, 8, 4)
    centroids = _load_or_build_index(sf_dir, idx, 8, 4)

    out = widen(ann_ivf(sf_dir, k, num_queries), "ivf")
    out = out.union(
        widen(ann_ivf_kmeans(sf_dir, k, num_queries, centroids=centroids), "ivf_kmeans")
    )
    out = out.union(
        widen(
            ann_ivf_partitioned(sf_dir, k, num_queries, index_dir=idx),
            "ivf_partitioned",
        )
    )
    out = out.union(widen(ann_topk_quantized(sf_dir, k, num_queries), "quantized"))
    out = out.union(
        widen(kmeans_cluster_stats(sf_dir, centroids=centroids), "kmeans_stats")
    )
    return out


def ann_ivf(
    sf_dir: str, k: int = 5, num_queries: int = 8, nprobe: int = 2
) -> ray.data.Dataset:
    """IVF-bucketed approximate top-k: probe the ``nprobe`` label
    partitions whose centroids are nearest each query. Approximate by
    construction (recall < 1 when the true neighbor lives in an
    unprobed partition) — benchmarked against :func:`ann_topk`."""
    # coarse centroids via partial/final mean: each batch emits per-label
    # (sum, count) partials, the tiny partials merge on the driver — no
    # shuffle ever touches the vectors (a groupby(label).map_groups here
    # would all-to-all the whole embedding table to compute a handful of
    # means).
    def centroid_partial(batch: pa.Table) -> pa.Table:
        labs = batch.column("label").to_numpy()
        emb = list_column_to_matrix(batch.column("embedding"))
        uniq, inv = np.unique(labs, return_inverse=True)
        sums = np.zeros((len(uniq), emb.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, emb)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq),
                "sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "count": pa.array(counts),
            }
        )

    # stream the partial-mean reduce (one block resident at a time —
    # take_all would grow with batch count; see stages/kmeans.py)
    parts = read_table(
        sf_dir, "embeddings", columns=["label", "embedding"]
    ).map_batches(centroid_partial, batch_format="pyarrow", zero_copy_batch=True)
    acc: dict[int, list] = {}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for la, s, c in zip(
            b.column("label").to_pylist(),
            b.column("sum").to_pylist(),
            b.column("count").to_pylist(),
        ):
            prev_s, prev_c = acc.setdefault(int(la), [0.0, 0])
            acc[int(la)] = [prev_s + np.asarray(s), prev_c + c]
    labels = np.array(sorted(acc), dtype=np.int64)
    cmat = np.stack([acc[la][0] / acc[la][1] for la in labels])
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)

    qids, qmat = _query_block(sf_dir, num_queries)
    # dense (n_query, n_labels) probe mask aligned with the sorted label
    # array: the partial below does one boolean fancy-index per query
    # (searchsorted label→column) instead of a per-row Python membership
    # test — the same vectorized shape as _probed_partial_fn.
    sims_qc = qmat @ cmat.T
    probe_mask = np.zeros((len(qids), len(labels)), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[qi, np.argsort(-sims_qc[qi])[:nprobe]] = True

    probed_labels = sorted(labels[probe_mask.any(axis=0)].tolist())
    import pyarrow.compute as pc

    ds = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]
    ).map_batches(
        lambda t: t.filter(pc.is_in(t.column("label"), pa.array(probed_labels))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    qref = ray.put((qids, qmat, labels, probe_mask))

    def partial(batch: pa.Table) -> pa.Table:
        ids_q, mat_q, all_labels, mask = ray.get(qref)
        vids = batch.column("vec_id").to_numpy()
        labs = batch.column("label").to_numpy().astype(np.int64)
        emb = list_column_to_matrix(batch.column("embedding"))
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cos = mat_q @ emb.T
        # all_labels is sorted (np.unique order upstream), and the
        # pre-filter guarantees every lab is present — searchsorted maps
        # each row to its mask column in one vectorized pass.
        lab_idx = np.searchsorted(all_labels, labs)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(ids_q)):
            allowed = mask[qi, lab_idx] & (vids != ids_q[qi])
            cand = np.nonzero(allowed)[0]
            if len(cand) == 0:
                continue
            order = cand[np.lexsort((vids[cand], -cos[qi][cand]))][:k]
            out_q.extend([int(ids_q[qi])] * len(order))
            out_v.extend(vids[order].tolist())
            out_s.extend(cos[qi][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


def knn_graph(
    sf_dir: str | None = None,
    k: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    ds: ray.data.Dataset | None = None,
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """(query_id, neighbor_id, rank, cosine) for EVERY vector — the
    all-docs k-NN graph, the unbounded-both-sides member of the ANN
    family (``ann_topk`` broadcasts a bounded query block; here every
    vector is a query, so nothing can broadcast).

    IVF shape: trained coarse centroids (``stages/kmeans.py``), then
    every vector lands in its cosine-nearest cluster as an indexed
    MEMBER and replicates to its ``nprobe`` nearest clusters as a
    QUERY (the home row serves as both). One coarse-bucketed grouped
    map per cluster computes the query × member partial top-k inside
    the cluster task; a second coarse-bucketed merge keeps each
    query's global top-k. Exchanges: n × nprobe replica rows (the only
    time vectors move) and n × nprobe × k candidate rows — never an
    all-pairs shuffle. Cluster tasks cost O((n/C)² · dim): pick
    ``n_clusters`` ≈ sqrt(n/dim-budget) as n grows; recall < 1 when a
    true neighbor lives in an unprobed cluster — data-dependent like
    every IVF: ≥0.95 on cluster-structured data (pinned in tests),
    ~0.5 on the near-isotropic synthetic embeddings table where
    NO coarse quantizer can separate neighborhoods. With ``n_clusters=1`` the graph is EXACT brute
    force (pinned against a dense numpy reference). Ties break
    (cosine desc, neighbor_id asc) and cosine rounds to 6 decimals,
    exactly like ``ann_topk``."""
    from ..stages.grouped import grouped_map, sorted_bucket_map
    from ..stages.kmeans import kmeans_fit

    if ds is None:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    nprobe = min(nprobe, n_clusters)
    cents = kmeans_fit(ds, k=n_clusters)
    cnorm = cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
    )
    cref = ray.put(cnorm)

    def explode(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        vids = batch.column("vec_id").to_numpy()
        emb = list_column_to_matrix(batch.column("embedding"))
        nrm = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = nrm @ c.T
        probes = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        n, d = nrm.shape
        # p-major replication: p == 0 is the home (member) copy
        rep_ids = np.tile(vids, nprobe)
        rep_cluster = probes.T.reshape(-1)
        rep_member = np.repeat(np.arange(nprobe) == 0, n)
        rep_vecs = np.tile(nrm, (nprobe, 1))
        return pa.table(
            {
                "vec_id": pa.array(rep_ids, pa.int64()),
                "cluster": pa.array(rep_cluster.astype(np.int64)),
                "is_member": pa.array(rep_member),
                "vec": pa.array(
                    list(rep_vecs), pa.list_(pa.float64())
                ),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def cluster_topk(g: pd.DataFrame) -> pd.DataFrame:
        mem = g[g["is_member"]]
        if not len(mem):
            # a centroid can attract probe replicas yet be nobody's
            # cosine-argmax home — that cluster indexes nothing and
            # contributes no candidates (np.stack on empty would raise)
            return pd.DataFrame(
                {
                    "query_id": np.array([], dtype=np.int64),
                    "neighbor_id": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                    "__neg_cos": np.array([], dtype=np.float64),
                }
            )
        mids = mem["vec_id"].to_numpy()
        M = np.stack(mem["vec"].to_numpy())
        qids = g["vec_id"].to_numpy()
        Q = np.stack(g["vec"].to_numpy())
        cos = Q @ M.T
        # self-pairs sort last (-inf) and are dropped by the finite mask
        cos[qids[:, None] == mids[None, :]] = -np.inf
        n_q, n_m = cos.shape
        # A flat lexsort replaces the per-query loop: sort (query row,
        # cosine desc, member id asc) — stable, so ties break exactly
        # like a per-row lexsort. Chunked over query rows so the three
        # flat int64/float64 temporaries stay ~4M elements regardless of
        # cluster size (they'd otherwise triple the cos matrix's
        # footprint per task); each chunk is still whole-column work.
        per_chunk = max(1, _TOPK_CHUNK_ELEMS // max(n_m, 1))
        out_q, out_v, out_c = [], [], []
        for q0 in range(0, n_q, per_chunk):
            q1 = min(q0 + per_chunk, n_q)
            nq = q1 - q0
            flat = cos[q0:q1].ravel()
            tiled_mids = np.tile(mids, nq)
            order = np.lexsort(
                (tiled_mids, -flat, np.repeat(np.arange(nq), n_m))
            )
            # blocks stay contiguous per query row: in-row rank is mod n_m
            keep = (np.arange(nq * n_m) % n_m < k) & np.isfinite(flat[order])
            sel = order[keep]
            out_q.append(qids[q0:q1][sel // n_m])
            out_v.append(tiled_mids[sel])
            out_c.append(flat[sel])
        picked = np.concatenate(out_c) if out_c else np.empty(0, np.float64)
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q)
                if out_q
                else np.empty(0, np.int64),
                "neighbor_id": np.concatenate(out_v)
                if out_v
                else np.empty(0, np.int64),
                "cosine": picked,
                # merge sort key (the final stage sorts ascending only)
                "__neg_cos": -picked,
            }
        )

    partials = grouped_map(exploded, "cluster", cluster_topk, num_buckets=num_buckets)

    def final_bucket(part: pd.DataFrame) -> pd.DataFrame:
        # sorted by (query, cosine desc, neighbor asc): each query's
        # global top-k is one cumcount mask — every vector is a fine
        # key, so the per-group _final_topk loop would dominate here
        rank = part.groupby("query_id", sort=False).cumcount()
        keep = rank < k
        out = part.loc[keep, ["query_id", "neighbor_id"]].copy(deep=False)
        out["rank"] = (rank[keep] + 1).astype(np.int64)
        out["cosine"] = round_half_away(
            part.loc[keep, "cosine"].to_numpy(), 6
        )  # FP-stable cross-engine, rounded AFTER selection like _final_topk
        return out

    return sorted_bucket_map(
        partials,
        "query_id",
        ["__neg_cos", "neighbor_id"],
        final_bucket,
        num_buckets=num_buckets,
    )
