"""bfs_hops (stages/graph.py): hop distances vs a pure-Python BFS on
random graphs, multi-source fronts, and unreachable components."""

from collections import deque

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.graph import bfs_hops


def _ref(pairs, sources):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(pairs, sources):
    tbl = pa.table({"a": pa.array([p[0] for p in pairs],
                                  type=pa.int64()),
                    "b": pa.array([p[1] for p in pairs],
                                  type=pa.int64())})
    df = bfs_hops(rd.from_arrow(tbl).repartition(5), sources,
                  buckets=8).to_pandas()
    return {int(r.node): int(r.hops) for r in df.itertuples()}


def test_bfs_random_graph(ray_session):
    rng = np.random.default_rng(4)
    # sparse graph so distances spread over several hops
    pairs = [(int(x), int(y))
             for x, y in rng.integers(0, 120, size=(140, 2))]
    pairs += [(500, 501), (501, 502)]   # island, unreachable from 0
    got = _run(pairs, sources=[0])
    want = _ref(pairs, sources=[0])
    assert got == want
    assert 500 not in got


def test_bfs_multi_source_chain(ray_session):
    # path 0-1-2-...-9 with sources at both ends: hops = min distance
    pairs = [(i, i + 1) for i in range(9)]
    got = _run(pairs, sources=[0, 9])
    assert got == {i: min(i, 9 - i) for i in range(10)}


def test_bfs_modes_identical(ray_session):
    """broadcast (default) and dataset modes return identical hop maps."""
    rng = np.random.default_rng(9)
    pairs = [(int(x), int(y))
             for x, y in rng.integers(0, 90, size=(120, 2))]
    tbl = pa.table({"a": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "b": pa.array([p[1] for p in pairs], type=pa.int64())})
    ds = rd.from_arrow(tbl).repartition(4)
    bc = bfs_hops(ds, [3, 7], buckets=8, frontier_mode="broadcast") \
        .to_pandas()
    dt = bfs_hops(ds, [3, 7], buckets=8, frontier_mode="dataset") \
        .to_pandas()
    key = lambda df: sorted(map(tuple, df[["node", "hops"]].values))
    assert key(bc) == key(dt) != []


def test_bfs_empty_sources(ray_session):
    """Empty source set reaches nothing — broadcast mode used to
    IndexError probing an empty frontier array (round-3 ADVICE)."""
    tbl = pa.table({"a": pa.array([1, 2], type=pa.int64()),
                    "b": pa.array([2, 3], type=pa.int64())})
    for mode in ("broadcast", "dataset"):
        out = bfs_hops(rd.from_arrow(tbl), [], buckets=8,
                       frontier_mode=mode)
        assert out.count() == 0
        assert list(out.schema().names) == ["node", "hops"]
