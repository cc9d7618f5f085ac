"""PageRank over an edge Dataset — the power-iteration shape on Ray Data.

Same iterative contract as ``stages/kmeans.py`` and ``stages/cc.py``:
deterministic init, a FIXED number of rounds (no convergence-dependent
stop — reproducible across block structures), per-iteration work =
one label-attach join (``auto_join`` — broadcast when ranks fit, shuffle
when they don't) plus one coarse-bucketed sum-reduction
(:func:`stages.grouped.bucketed_agg` — pre-aggregated partials, no
fine-key distributed sort over node ids). Edges materialize once and
are reused every round; ranks never collect on the driver.

Dangling nodes (no out-edges) follow the standard redistribution: their
mass joins the teleport term uniformly, so the rank vector keeps summing
to 1 (asserted by test against a dense numpy power iteration).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def pagerank(
    edges_ds: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> ray.data.Dataset:
    """(node, rank) after ``iterations`` rounds of power iteration."""
    from .shuffle_join import auto_join

    def explode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column(src).cast(pa.int64()),
                "dst": t.column(dst).cast(pa.int64()),
            }
        )

    edges = edges_ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # node universe + out-degree (dangling nodes keep degree 0)
    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t.column("src").combine_chunks(), t.column("dst").combine_chunks()]
                ),
                "is_src": pa.array(
                    np.concatenate(
                        [np.ones(t.num_rows, np.int64), np.zeros(t.num_rows, np.int64)]
                    )
                ),
            }
        )

    from .grouped import bucketed_agg

    if edges.count() == 0:
        # short-circuit before any groupby (Dataset.groupby on a truly
        # empty dataset has no schema to bucket on)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )

    degrees = bucketed_agg(
        edges.map_batches(
            node_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        "node",
        "is_src",
        how="sum",
        out="out_degree",
    ).materialize()
    n_nodes = degrees.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )

    ranks = degrees.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array(
                    np.full(t.num_rows, 1.0 / n_nodes), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    for _ in range(iterations):
        # rank + degree per node, for the per-edge contribution —
        # materialized because it is consumed three times per round
        # (dangling-mass sum, auto_join's right-side count, the join)
        state = auto_join(
            ranks, degrees, on="node", left_cols=["rank"], right_cols=["out_degree"]
        ).materialize()
        # dangling mass = sum of ranks with no out-edges (tiny scalar)
        dm_row = state.map_batches(
            lambda t: pa.table(
                {
                    "dm": pa.array(
                        [
                            float(
                                np.where(
                                    t.column("out_degree").to_numpy() == 0,
                                    t.column("rank").to_numpy(),
                                    0.0,
                                ).sum()
                            )
                        ],
                        pa.float64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).aggregate(Sum("dm", alias_name="dm"))
        dangling_mass = float(dm_row["dm"])

        contrib = auto_join(
            edges.map_batches(
                lambda t: t.rename_columns(["node", "dst"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            state,
            on="node",
            left_cols=["dst"],
            right_cols=["rank", "out_degree"],
        )

        def to_contrib(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy()
            d = t.column("out_degree").to_numpy()
            return pa.table(
                {
                    "node": t.column("dst"),
                    "c": pa.array(r / np.maximum(d, 1), pa.float64()),
                }
            )

        sums = bucketed_agg(
            contrib.map_batches(
                to_contrib, batch_format="pyarrow", zero_copy_batch=True
            ),
            "node",
            "c",
            how="sum",
            out="in_sum",
        )
        base = (1.0 - damping) / n_nodes + damping * dangling_mass / n_nodes

        # every node gets the base term; nodes with in-edges add their sum
        joined = auto_join(
            degrees.map_batches(
                lambda t: t.select(["node"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            sums,
            on="node",
            left_cols=[],
            right_cols=["in_sum"],
            how="left",
        )
        ranks = joined.map_batches(
            lambda t, base=base: pa.table(
                {
                    "node": t.column("node"),
                    "rank": pa.array(
                        base
                        + damping
                        * np.nan_to_num(
                            t.column("in_sum").to_numpy(zero_copy_only=False)
                        ),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    return ranks
