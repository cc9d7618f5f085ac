"""Distributed connected components over a pair/edge Dataset.

Min-label propagation: every node's label starts as its own id and each
iteration becomes the min of its label and its neighbors' labels —
``L_{t+1}(u) = min(L_t(u), min_{(u,v)∈E} L_t(v))`` — until the label
multiset stops changing (labels are monotone non-increasing ints, so an
unchanged label SUM certifies convergence with one cheap scalar
aggregate, no diff join). Each iteration is one label-attach join plus
one coarse-bucketed min-reduction over the edge list
(:func:`stages.grouped.bucketed_agg` — per-batch pre-aggregation, a
256-value shuffle sort instead of a fine-key distributed sort over
every node id); edges and labels never materialize
on the driver, and the join rides :func:`stages.shuffle_join.auto_join`
so a small label table broadcasts and a big one shuffles.

Converges in O(graph diameter) iterations — the right tool for the
near-duplicate cluster graphs it serves (dup clusters are dense and
shallow); ``max_iters`` bounds pathological chains and raising on
non-convergence keeps silent truncation out (observable, per the
no-silent-caps rule). This is the at-scale alternative to the
driver-side union-find in ``pipelines/dedup.py:dedup_keep_best``
(exact-same components, pinned by test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def connected_components(
    pairs: ray.data.Dataset,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_iters: int = 25,
) -> ray.data.Dataset:
    """(node, component) for every node appearing in ``pairs``;
    ``component`` = the smallest node id in the node's component."""

    def explode(t: pa.Table) -> pa.Table:
        a = t.column(col_a).to_numpy().astype(np.int64)
        b = t.column(col_b).to_numpy().astype(np.int64)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b])),
                "v": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # reused every iteration
    if edges.count() == 0:
        # no pairs → no clustered nodes (Dataset.aggregate returns None
        # on empty input, so the iteration below must not run)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                }
            )
        )

    import pyarrow.compute as pc

    # initial labels: min neighbor ∪ self = one min-groupby over edges
    # with the self-loop implied by both directions being present
    def with_self(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("u"),
                "cand": pc.min_element_wise(t.column("u"), t.column("v")),
            }
        )

    from .grouped import bucketed_agg

    labels = bucketed_agg(
        edges.map_batches(
            with_self, batch_format="pyarrow", zero_copy_batch=True
        ),
        "node",
        "cand",
        how="min",
        out="label",
    ).materialize()

    def label_sum(ds) -> int:
        row = ds.aggregate(Sum("label", alias_name="s"))
        return int(row["s"])

    prev_sum = label_sum(labels)
    for _ in range(max_iters):
        from .shuffle_join import auto_join

        # attach v's current label to each (u, v) edge, then take the
        # min over u's incoming labels and u's own label
        msgs = auto_join(
            edges,
            labels.map_batches(
                lambda t: t.rename_columns(["v", "label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            on="v",
            left_cols=["u"],
            right_cols=["label"],
        ).map_batches(
            lambda t: pa.table(
                {"node": t.column("u"), "cand": t.column("label")}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        own = labels.map_batches(
            lambda t: t.rename_columns(["node", "cand"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        labels = bucketed_agg(
            msgs.union(own), "node", "cand", how="min", out="label"
        ).materialize()
        cur = label_sum(labels)
        if cur == prev_sum:
            return labels.map_batches(
                lambda t: t.rename_columns(["node", "component"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        prev_sum = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations "
        f"(graph diameter exceeds the bound — raise max_iters)"
    )
