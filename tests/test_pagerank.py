"""Distributed PageRank (stages/graph.pagerank) vs a dense numpy power
iteration on random graphs, plus dangling-node handling."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.graph import pagerank


def _numpy_pagerank(edges, n, iters, d=0.85):
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        acc = np.zeros(n)
        contrib = r / np.maximum(deg, 1)
        for s, t in edges:
            acc[t] += contrib[s]
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (acc + dangling / n)
    return r


@pytest.mark.parametrize("seed,n,m", [(3, 40, 300), (9, 25, 80)])
def test_pagerank_vs_numpy(ray_session, seed, n, m):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    # node n-1 dangling: remove its out-edges
    keep = src != n - 1
    src, dst = src[keep], dst[keep]
    tbl = pa.table({"src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64())})
    out = pagerank(rd.from_arrow(tbl).repartition(5), n, n_iters=8)
    mine = np.asarray(out["rank"])
    ref = _numpy_pagerank(list(zip(src, dst)), n, 8)
    assert np.allclose(mine, ref, rtol=0, atol=1e-12)
    assert abs(mine.sum() - 1.0) < 1e-9          # probability mass kept


@pytest.mark.parametrize("seed,n,m", [(3, 40, 300), (9, 25, 80)])
def test_pagerank_distributed_parity(ray_session, seed, n, m):
    """Dataset-rank-state path (no O(nodes) driver state) must match the
    dense path to summation-order tolerance, dangling nodes included."""
    import ray.data as rd

    from osmium_tool_ray.stages.graph import pagerank_distributed

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != n - 1
    src, dst = src[keep], dst[keep]
    tbl = pa.table({"src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64())})
    out = pagerank_distributed(rd.from_arrow(tbl).repartition(5), n,
                               n_iters=8, buckets=7)
    assert out["node"].to_pylist() == list(range(n))
    mine = np.asarray(out["rank"])
    ref = _numpy_pagerank(list(zip(src, dst)), n, 8)
    assert np.allclose(mine, ref, rtol=0, atol=1e-9)
    assert abs(mine.sum() - 1.0) < 1e-9


def test_pagerank_cap_switches_to_distributed(ray_session):
    """driver_cap below n routes pagerank() through the Dataset path."""
    import ray.data as rd

    n = 12
    tbl = pa.table({"src": pa.array([0, 1, 2, 3] * 3, type=pa.int64()),
                    "dst": pa.array([1, 2, 3, 0] * 3, type=pa.int64())})
    dense = pagerank(rd.from_arrow(tbl), n, n_iters=5)
    routed = pagerank(rd.from_arrow(tbl), n, n_iters=5, driver_cap=4)
    assert np.allclose(np.asarray(dense["rank"]),
                       np.asarray(routed["rank"]), atol=1e-9)
