"""Distributed triangle counting (stages/graph.triangle_count) vs an
exact numpy adjacency-matrix count, including hand-built graphs."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.graph import triangle_count


def _exact(edges, n):
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        if a != b:
            A[a, b] = A[b, a] = 1
    return int(np.trace(A @ A @ A) // 6)


def _count(tbl):
    return tbl["n_triangles"][0].as_py()


def test_triangles_hand_built(ray_session):
    import ray.data as rd

    # K4 (4 triangles... actually C(4,3)=4) plus a pendant and a square
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),   # K4
             (3, 4),                                            # pendant
             (5, 6), (6, 7), (7, 8), (8, 5)]                    # C4: none
    tbl = pa.table({"a": pa.array([e[0] for e in edges], type=pa.int64()),
                    "b": pa.array([e[1] for e in edges], type=pa.int64())})
    out = triangle_count(rd.from_arrow(tbl).repartition(3), buckets=4)
    assert _count(out) == 4 == _exact(edges, 9)


def test_triangles_random_vs_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(13)
    n = 60
    a = rng.integers(0, n, 800)
    b = rng.integers(0, n, 800)
    # duplicates + both orientations + self loops all present
    tbl = pa.table({"a": pa.array(np.concatenate([a, b]), type=pa.int64()),
                    "b": pa.array(np.concatenate([b, a]), type=pa.int64())})
    out = triangle_count(rd.from_arrow(tbl).repartition(5), buckets=7)
    assert _count(out) == _exact(list(zip(a.tolist(), b.tolist())), n)


def test_triangles_bucketed_deg_path_identical(ray_session):
    """Forced deg_cap=0 routes the degree attach through the bucketed
    union join (blocks.attach_lookup_bucketed) — count must match the
    broadcast path (round-4: the cap used to raise)."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    n = 50
    a = rng.integers(0, n, 500)
    b = rng.integers(0, n, 500)
    edges = list(zip(a.tolist(), b.tolist()))
    tbl = pa.table({"a": pa.array(a, type=pa.int64()),
                    "b": pa.array(b, type=pa.int64())})
    ds = rd.from_arrow(tbl).repartition(5)
    broad = _count(triangle_count(ds, buckets=4))
    buck = _count(triangle_count(ds, buckets=4, deg_cap=0))
    assert broad == buck == _exact(edges, n)
