"""sssp_weighted (stages/graph.sssp_weighted): convergence mode vs a
heapq Dijkstra, hop-bounded mode vs k-round Bellman-Ford, lightest
parallel edge kept, self-loops dropped, empty sources."""
import heapq

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.graph import sssp_weighted


def _dijkstra(edges, src):
    adj: dict = {}
    for a, b, w in edges:
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        adj.setdefault(a, {})
        adj.setdefault(b, {})
        cur = adj[a].get(b)
        if cur is None or w < cur:
            adj[a][b] = w
            adj[b][a] = w
    dist = {s: 0 for s in src}
    pq = [(0, s) for s in src]
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, {}).items():
            nd = d + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _bf_khop(edges, src, k):
    # min over paths of <= k edges
    adj: dict = {}
    for a, b, w in edges:
        if a == b:
            continue
        for (u, v) in ((a, b), (b, a)):
            cur = adj.setdefault(u, {}).get(v)
            if cur is None or w < cur:
                adj[u][v] = w
    dist = {s: 0 for s in src}
    for _ in range(k):
        new = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, {}).items():
                if d + w < new.get(v, 1 << 62):
                    new[v] = d + w
        dist = new
    return dist


def _run(edges, src, **kw):
    tbl = pa.table({"a": pa.array([e[0] for e in edges], type=pa.int64()),
                    "b": pa.array([e[1] for e in edges], type=pa.int64()),
                    "w": pa.array([e[2] for e in edges], type=pa.int64())})
    out = sssp_weighted(rd.from_arrow(tbl).repartition(4), src, **kw) \
        .to_pandas()
    if out.empty:
        return {}
    return dict(zip(out.node, out.dist))


def test_sssp_convergence_matches_dijkstra(ray_session):
    rng = np.random.default_rng(17)
    for trial in range(3):
        n_edges = 300
        edges = list(zip(rng.integers(0, 60, n_edges).tolist(),
                         rng.integers(0, 60, n_edges).tolist(),
                         rng.integers(0, 20, n_edges).tolist()))
        src = [0, 7]
        got = _run(edges, src)
        want = _dijkstra(edges, src)
        assert got == want, trial


def test_sssp_hop_bounded_matches_bellman_ford(ray_session):
    rng = np.random.default_rng(19)
    edges = list(zip(rng.integers(0, 40, 150).tolist(),
                     rng.integers(0, 40, 150).tolist(),
                     rng.integers(1, 10, 150).tolist()))
    for k in (1, 2, 3):
        got = _run(edges, [3], max_hops=k)
        want = _bf_khop(edges, [3], k)
        assert got == want, k


def test_sssp_parallel_edges_keep_lightest(ray_session):
    got = _run([(0, 1, 9), (0, 1, 2), (1, 2, 1)], [0])
    assert got == {0: 0, 1: 2, 2: 3}


def test_sssp_empty_sources(ray_session):
    got = _run([(0, 1, 1)], [])
    assert got == {}
