"""Corridor membership (stages/spatial.corridor_points) vs brute-force
numpy point-segment distance and a hand fixture covering all three CASE
branches (before-a, past-b, interior projection)."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.spatial import corridor_points


def _brute(px, py, segs, r):
    keep = np.zeros(len(px), dtype=bool)
    for x1, y1, x2, y2 in zip(segs["x1"], segs["y1"], segs["x2"],
                              segs["y2"]):
        dx, dy = x2 - x1, y2 - y1
        qx, qy = px - x1, py - y1
        len2 = dx * dx + dy * dy
        dot = dx * qx + dy * qy
        if len2 == 0:
            d2 = qx * qx + qy * qy
        else:
            t = np.clip(dot / len2, 0.0, 1.0)
            ex = qx - t * dx
            ey = qy - t * dy
            d2 = ex * ex + ey * ey
        keep |= d2 <= r * r + 1e-9
    return keep


def test_corridor_vs_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(31)
    n, m = 2000, 17
    px = rng.integers(-10000, 10000, n)
    py = rng.integers(-10000, 10000, n)
    segs = {k: rng.integers(-10000, 10000, m).astype(np.int64)
            for k in ("x1", "y1", "x2", "y2")}
    pts = pa.table({"id": pa.array(range(n), type=pa.int64()),
                    "x": pa.array(px, type=pa.int64()),
                    "y": pa.array(py, type=pa.int64())})
    out = corridor_points(rd.from_arrow(pts).repartition(4), "x", "y",
                          segs, radius=900, seg_chunk=5)
    mine = sorted(r["id"] for r in out.take_all())
    want = sorted(np.flatnonzero(
        _brute(px.astype(float), py.astype(float), segs, 900)).tolist())
    assert mine == want


def test_corridor_branches(ray_session):
    import ray.data as rd

    # one horizontal segment (0,0)-(10,0), radius 2
    segs = {"x1": [0], "y1": [0], "x2": [10], "y2": [0]}
    pts = pa.table({
        "id": pa.array(range(7), type=pa.int64()),
        # before a (within), before a (outside), interior (within),
        # interior (outside), past b (within), past b (outside), on seg
        "x": pa.array([-1, -3, 5, 5, 11, 14, 7], type=pa.int64()),
        "y": pa.array([1, 0, 2, 3, -1, 0, 0], type=pa.int64()),
    })
    out = corridor_points(rd.from_arrow(pts), "x", "y", segs, radius=2)
    assert sorted(r["id"] for r in out.take_all()) == [0, 2, 4, 6]


def test_corridor_degenerate_segment(ray_session):
    import ray.data as rd

    segs = {"x1": [5], "y1": [5], "x2": [5], "y2": [5]}  # a point
    pts = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                    "x": pa.array([6, 9], type=pa.int64()),
                    "y": pa.array([6, 9], type=pa.int64())})
    out = corridor_points(rd.from_arrow(pts), "x", "y", segs, radius=2)
    assert [r["id"] for r in out.take_all()] == [1]
