"""Per-node clustering coefficient (stages/graph.clustering_coefficient)
vs numpy brute force, incl. the forced bucketed-degree-orient path and a
triangle-free graph."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.graph import clustering_coefficient


def _brute(a, b, n):
    adj = np.zeros((n, n), dtype=bool)
    adj[a, b] = True
    adj[b, a] = True
    np.fill_diagonal(adj, False)
    deg = adj.sum(1)
    tri = np.zeros(n, dtype=np.int64)
    for v in range(n):
        nb = np.flatnonzero(adj[v])
        tri[v] = adj[np.ix_(nb, nb)].sum() // 2
    return deg, tri


def _check(out, a, b, n):
    rows = {r["node"]: (r["degree"], r["triangles"], r["coeff"])
            for r in out.take_all()}
    deg, tri = _brute(a, b, n)
    want = {}
    for v in range(n):
        if deg[v] == 0:
            continue
        c = (2.0 * tri[v]) / (deg[v] * (deg[v] - 1)) if deg[v] >= 2 \
            else 0.0
        want[v] = (deg[v], tri[v], c)
    assert rows == want


def test_clustering_vs_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n, m = 60, 400
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    edges = pa.table({"a": pa.array(a, type=pa.int64()),
                      "b": pa.array(b, type=pa.int64())})
    out = clustering_coefficient(rd.from_arrow(edges).repartition(4))
    _check(out, a, b, n)


def test_clustering_forced_bucketed_degrees(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n, m = 40, 220
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    edges = pa.table({"a": pa.array(a, type=pa.int64()),
                      "b": pa.array(b, type=pa.int64())})
    out = clustering_coefficient(rd.from_arrow(edges), deg_cap=1)
    _check(out, a, b, n)


def test_clustering_triangle_free(ray_session):
    import ray.data as rd

    # a path graph 0-1-2-3: no triangles anywhere
    edges = pa.table({"a": pa.array([0, 1, 2], type=pa.int64()),
                      "b": pa.array([1, 2, 3], type=pa.int64())})
    out = clustering_coefficient(rd.from_arrow(edges))
    rows = {r["node"]: (r["degree"], r["triangles"], r["coeff"])
            for r in out.take_all()}
    assert rows == {0: (1, 0, 0.0), 1: (2, 0, 0.0),
                    2: (2, 0, 0.0), 3: (1, 0, 0.0)}
