"""PageRank power iteration vs a dense numpy reference."""

from __future__ import annotations

import numpy as np


def _ref_pagerank(edges, damping, iters):
    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = {}
    for u, _ in edges:
        out_deg[u] = out_deg.get(u, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = sum(r[idx[v]] for v in nodes if out_deg.get(v, 0) == 0)
        new = np.zeros(n)
        for u, v in edges:
            new[idx[v]] += r[idx[u]] / out_deg[u]
        r = (1 - damping) / n + damping * dm / n + damping * new
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_dense_reference(ray_session):
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.stages.pagerank import pagerank

    # hub-and-spoke + a cycle + a dangling sink + a duplicate edge
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1),
        (5, 6), (6, 7), (7, 5),
        (3, 8),          # 8 is dangling (no out-edges)
        (2, 1),          # duplicate edge counts twice (multigraph)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _ in edges], pa.int64()),
                "dst": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    ).repartition(3)

    got = {
        r["node"]: r["rank"]
        for r in pagerank(ds, iterations=8).take_all()
    }
    expect = _ref_pagerank(edges, damping=0.85, iters=8)
    assert set(got) == set(expect)
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-9, (v, got[v], expect[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # dangling mass conserved
    # the hub out-ranks every spoke
    assert got[1] == max(got.values())


def test_pagerank_empty_edges(ray_session):
    import pyarrow as pa
    import ray.data

    from mhdb_tables2turtles_ray.stages.pagerank import pagerank

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    assert pagerank(empty).take_all() == []
