"""Distributed Lloyd k-means over an embedding column.

The iterative-algorithm shape on Ray Data: each iteration is ONE pass —
``map_batches`` computes per-batch partial sums/counts per centroid
(combiner), the tiny partials reduce on the driver, centroids update,
repeat. No shuffle ever touches the vectors; per-iteration traffic is
``k × dim`` floats per batch. Deterministic: centroids initialize from
the first ``k`` vectors in ``vec_id`` order and iterate a fixed number
of rounds (no RNG, no convergence-dependent stop)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    from ..functions.numeric import list_column_to_matrix

    return list_column_to_matrix(batch.column("embedding"))


def _min_k_rows(ds, k: int, id_column: str) -> list[dict]:
    """The k rows with the smallest ``id_column``, via partial/final
    top-k: each batch keeps its own k smallest (argpartition — no full
    sort anywhere), the ≤ k×num_batches survivors merge on the driver.
    No shuffle ever touches the vectors; a ``ds.sort(id).limit(k)``
    would move every embedding through an all-to-all exchange to pick
    k rows."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy()
        if len(ids) > k:
            keep = np.argpartition(ids, k)[:k]
            batch = batch.take(pa.array(np.sort(keep)))
        return batch.select([id_column, "embedding"])

    # STREAM the final merge: a running top-k over iter_batches keeps
    # the driver at ≤ 2k rows — take_all() would resident k rows per
    # BATCH at once, which grows with the corpus
    best: list[dict] = []
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        best.extend(
            {id_column: i, "embedding": e}
            for i, e in zip(
                b.column(id_column).to_pylist(), b.column("embedding").to_pylist()
            )
        )
        best.sort(key=lambda r: r[id_column])
        del best[k:]
    return best


def kmeans_fit(
    ds,
    k: int = 8,
    iterations: int = 5,
    id_column: str = "vec_id",
) -> np.ndarray:
    """Fit ``k`` centroids over ``ds``'s ``embedding`` column; returns
    the (k, dim) centroid matrix."""
    # deterministic init: the k smallest ids (a bare limit() would pick
    # whichever blocks finished first under streaming execution)
    init_rows = _min_k_rows(ds, k, id_column)
    centroids = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in init_rows]
    )

    for _ in range(iterations):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            x = _batch_matrix(batch)
            # nearest centroid by squared euclidean (argmin over k)
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, x)
            np.add.at(counts, assign, 1)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c)), pa.int64()),
                    "sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                    "count": pa.array(counts, pa.int64()),
                }
            )

        # stream the reduce: k rows per batch arrive under backpressure
        # and fold into the running (sums, counts) — the driver never
        # holds more than one partial block (take_all would resident
        # #batches × k × dim floats at once)
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        parts = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            cl = b.column("cluster").to_numpy()
            np.add.at(sums, cl, np.asarray(b.column("sum").to_pylist()))
            np.add.at(counts, cl, b.column("count").to_numpy())
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    return centroids


def kmeans_assign(ds, centroids: np.ndarray, out_col: str = "cluster"):
    """Append each row's nearest-centroid id (one streamed pass)."""
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _batch_matrix(batch)
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column(
            out_col, pa.array(d2.argmin(axis=1).astype(np.int64))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
