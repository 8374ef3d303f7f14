"""label_propagation (stages/graph.py): fixed-round synchronous LPA vs
a pure-Python reference (ties to smallest label), community recovery on
planted cliques."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.graph import label_propagation


def _ref(pairs, iters):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, nbrs in adj.items():
            counts = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def _run(pairs, iters):
    tbl = pa.table({"a": pa.array([p[0] for p in pairs],
                                  type=pa.int64()),
                    "b": pa.array([p[1] for p in pairs],
                                  type=pa.int64())})
    df = label_propagation(rd.from_arrow(tbl).repartition(5),
                           iters=iters, buckets=8).to_pandas()
    return {int(r.node): int(r.label) for r in df.itertuples()}


def test_lpa_matches_reference(ray_session):
    rng = np.random.default_rng(17)
    pairs = [(int(x), int(y))
             for x, y in rng.integers(0, 80, size=(300, 2))]
    for iters in (1, 3):
        assert _run(pairs, iters) == _ref(pairs, iters)


def test_lpa_planted_cliques(ray_session):
    # two 6-cliques joined by one bridge edge: labels converge inside
    # each clique
    c1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    c2 = [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
    pairs = c1 + c2 + [(5, 10)]
    got = _run(pairs, iters=6)
    assert got == _ref(pairs, iters=6)
    assert len({got[i] for i in range(5)}) == 1       # clique 1 coheres
    assert len({got[i] for i in range(11, 16)}) == 1  # clique 2 coheres


def test_lpa_modes_identical(ray_session):
    """broadcast (default) and dataset modes produce identical labels."""
    rng = np.random.default_rng(21)
    pairs = [(int(x), int(y))
             for x, y in rng.integers(0, 70, size=(220, 2))]
    tbl = pa.table({"a": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "b": pa.array([p[1] for p in pairs], type=pa.int64())})
    ds = rd.from_arrow(tbl).repartition(4)
    bc = label_propagation(ds, iters=3, buckets=8,
                           mode="broadcast").to_pandas()
    dt = label_propagation(ds, iters=3, buckets=8,
                           mode="dataset").to_pandas()
    key = lambda df: sorted(map(tuple, df[["node", "label"]].values))
    assert key(bc) == key(dt) != []
