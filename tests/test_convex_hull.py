"""Per-key convex hull (stages/spatial.convex_hull_per_key) vs an
independent per-key monotone chain, across multi-partition inputs so
the map-side partial-hull prune is exercised."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.spatial import convex_hull_per_key


def _brute(k, x, y):
    def hull(pts):
        pts = sorted(set(pts))
        if len(pts) <= 2:
            return pts
        def cross(o, a, b):
            return ((a[0] - o[0]) * (b[1] - o[1])
                    - (a[1] - o[1]) * (b[0] - o[0]))
        lower = []
        for p in pts:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        upper = []
        for p in reversed(pts):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        return lower[:-1] + upper[:-1]

    out = {}
    for key in np.unique(k):
        pts = list(zip(x[k == key].tolist(), y[k == key].tolist()))
        h = hull(pts)
        a2 = (sum(h[i][0] * h[(i + 1) % len(h)][1]
                  - h[i][1] * h[(i + 1) % len(h)][0]
                  for i in range(len(h))) if len(h) >= 3 else 0)
        out[int(key)] = (len(h), a2)
    return out


def test_hulls_match_brute():
    rng = np.random.default_rng(6)
    n = 3000
    k = rng.integers(0, 40, n).astype(np.int64)
    x = rng.integers(0, 50, n).astype(np.int64)   # dense grid: collinear
    y = rng.integers(0, 50, n).astype(np.int64)
    tbl = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(y)})
    got = convex_hull_per_key(rd.from_arrow(tbl).repartition(8),
                              "k", "x", "y", buckets=5).to_pandas()
    gd = {int(r.k): (int(r.n_hull), int(r.area2))
          for r in got.itertuples()}
    assert gd == _brute(k, x, y)


def test_degenerate_keys():
    tbl = pa.table({
        "k": pa.array([1, 2, 2, 3, 3, 3], type=pa.int64()),
        "x": pa.array([5, 0, 9, 0, 5, 9], type=pa.int64()),
        "y": pa.array([5, 0, 9, 0, 5, 9], type=pa.int64()),
    })
    got = convex_hull_per_key(rd.from_arrow(tbl), "k", "x", "y",
                              buckets=2).to_pandas()
    gd = {int(r.k): (int(r.n_hull), int(r.area2))
          for r in got.itertuples()}
    # single point; two points; three collinear points -> 2-point hull
    assert gd == {1: (1, 0), 2: (2, 0), 3: (2, 0)}
