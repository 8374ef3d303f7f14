"""k-core peel (stages/graph.k_core) vs a pure-Python reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.graph import k_core


def _ref_kcore(edges, k):
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def _rand_edges(seed=21, nodes=80, m=260):
    rng = np.random.default_rng(seed)
    es = set()
    while len(es) < m:
        a, b = rng.integers(0, nodes, 2)
        if a != b:
            es.add((int(min(a, b)), int(max(a, b))))
    return sorted(es)


def test_k_core_matches_reference():
    edges = _rand_edges()
    tbl = pa.table({"a": pa.array([e[0] for e in edges], type=pa.int64()),
                    "b": pa.array([e[1] for e in edges], type=pa.int64())})
    for k in (2, 3, 5):
        got = k_core(rd.from_arrow(tbl).repartition(4), k,
                     partitions=3).to_pandas()
        gd = {int(r.node): int(r.degree) for r in got.itertuples()}
        assert gd == _ref_kcore(edges, k), f"k={k}"


def test_k_core_empty_when_k_too_large():
    tbl = pa.table({"a": pa.array([0, 1, 2], type=pa.int64()),
                    "b": pa.array([1, 2, 0], type=pa.int64())})
    got = k_core(rd.from_arrow(tbl), 5, partitions=2).to_pandas()
    assert len(got) == 0
