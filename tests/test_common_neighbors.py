"""common_neighbors (stages/graph.py): pair counts + Jaccard vs a pure-
Python adjacency-set reference on a random multigraph, and the declared
hub-center exclusion semantics."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.graph import common_neighbors


def _reference(pairs, cap):
    """Adjacency-set common-neighbor counts through centers of degree
    <= cap, plus full-degree Jaccard."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for c, nbrs in adj.items():
        if len(nbrs) > cap:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                k = (ns[i], ns[j])
                out[k] = out.get(k, 0) + 1
    return {k: (n, n / (len(adj[k[0]]) + len(adj[k[1]]) - n))
            for k, n in out.items()}


def _run(pairs, cap, ray_blocks=7):
    import ray.data as rd

    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(ray_blocks)
    df = common_neighbors(ds, max_center_degree=cap).to_pandas()
    return {(int(r.node_a), int(r.node_b)): (int(r.n_common),
                                             float(r.jaccard))
            for r in df.itertuples()}


def test_common_neighbors_random_graph(ray_session):
    rng = np.random.default_rng(11)
    pairs = [(int(x), int(y))
             for x, y in rng.integers(0, 60, size=(900, 2))]
    got = _run(pairs, cap=1_000)
    want = _reference(pairs, cap=1_000)
    assert set(got) == set(want)
    for k, (n, j) in want.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(j, abs=0, rel=0), k


def test_common_neighbors_hub_excluded(ray_session):
    # star around node 0 (degree 6 > cap 5) + a small clique; wedges
    # through the hub must not be counted, clique wedges must.
    pairs = [(0, i) for i in range(1, 7)]
    pairs += [(10, 11), (10, 12), (11, 12)]
    got = _run(pairs, cap=5)
    want = _reference(pairs, cap=5)
    assert got == want
    assert (1, 2) not in got          # only common neighbor is the hub
    assert got[(11, 12)][0] == 1      # witnessed through center 10


def test_common_neighbors_bucketed_deg_path_identical(ray_session):
    """Forced deg_cap=0: the center-cap filter and the Jaccard degree
    attach run through bucketed union joins — results must match the
    broadcast path exactly (round-4: the cap used to raise)."""
    rng = np.random.default_rng(23)
    n = 40
    a = rng.integers(0, n, 300)
    b = rng.integers(0, n, 300)
    pairs = list(zip(a.tolist(), b.tolist()))
    broad = _run(pairs, cap=10)
    buck_map = {}
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "a": np.array([p[0] for p in pairs], dtype=np.int64),
        "b": np.array([p[1] for p in pairs], dtype=np.int64),
    })).repartition(7)
    df = common_neighbors(ds, max_center_degree=10, deg_cap=0).to_pandas()
    for r in df.itertuples():
        buck_map[(int(r.node_a), int(r.node_b))] = (int(r.n_common),
                                                    float(r.jaccard))
    assert broad == buck_map
    assert broad == _reference(pairs, 10)
