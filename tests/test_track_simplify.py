"""Per-key Douglas-Peucker track simplification (pipelines/windows
.track_simplify) vs an independent recursive DP implementation."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import track_simplify


def _ref_dp(pts, eps):
    """Textbook recursive Douglas-Peucker (independent formulation:
    hypot-based distances, recursion instead of a stack)."""
    if len(pts) < 3:
        return list(range(len(pts)))
    (x1, y1), (x2, y2) = pts[0], pts[-1]
    dmax, imax = -1.0, 0
    for i in range(1, len(pts) - 1):
        px, py = pts[i]
        dx, dy = x2 - x1, y2 - y1
        seg = np.hypot(dx, dy)
        if seg == 0:
            d = np.hypot(px - x1, py - y1)
        else:
            d = abs((px - x1) * dy - (py - y1) * dx) / seg
        if d > dmax:
            dmax, imax = d, i
    if dmax > eps:
        left = _ref_dp(pts[:imax + 1], eps)
        right = _ref_dp(pts[imax:], eps)
        return left[:-1] + [i + imax for i in right]
    return [0, len(pts) - 1]


def _tracks_tbl(seed=5, users=12, maxlen=60):
    rng = np.random.default_rng(seed)
    rows = {"user_id": [], "ts": [], "x": [], "y": [], "eid": []}
    eid = 0
    for u in range(users):
        m = int(rng.integers(1, maxlen))
        xs = np.cumsum(rng.integers(-50, 51, m))
        ys = np.cumsum(rng.integers(-50, 51, m))
        for i in range(m):
            rows["user_id"].append(u)
            rows["ts"].append(1_700_000_000_000_000 + i * 1_000_000)
            rows["x"].append(int(xs[i]))
            rows["y"].append(int(ys[i]))
            rows["eid"].append(eid)
            eid += 1
    return pa.table({
        "user_id": pa.array(rows["user_id"], type=pa.int64()),
        "ts": pa.array(rows["ts"], type=pa.timestamp("us")),
        "x": pa.array(rows["x"], type=pa.int64()),
        "y": pa.array(rows["y"], type=pa.int64()),
        "eid": pa.array(rows["eid"], type=pa.int64()),
    })


def test_track_simplify_vs_recursive(ray_session):
    import ray.data as rd

    tbl = _tracks_tbl()
    for eps in (10.0, 40.0, 0.5):
        out = track_simplify(rd.from_arrow(tbl).repartition(4),
                             "user_id", "ts", "x", "y",
                             epsilon=eps, tie_col="eid", buckets=5)
        mine = sorted((r["user_id"], r["pt_idx"], r["x"], r["y"])
                      for r in out.take_all())
        expected = []
        users = tbl["user_id"].to_numpy(zero_copy_only=False)
        xs = tbl["x"].to_numpy(zero_copy_only=False)
        ys = tbl["y"].to_numpy(zero_copy_only=False)
        for u in np.unique(users):
            sel = np.flatnonzero(users == u)  # rows already ts-ordered
            pts = list(zip(xs[sel].astype(float), ys[sel].astype(float)))
            for k in _ref_dp(pts, eps):
                expected.append((int(u), int(k), int(xs[sel][k]),
                                 int(ys[sel][k])))
        assert mine == sorted(expected)


def test_track_simplify_endpoints_always_kept(ray_session):
    import ray.data as rd

    tbl = _tracks_tbl(seed=11, users=6)
    out = track_simplify(rd.from_arrow(tbl), "user_id", "ts", "x", "y",
                         epsilon=1e12, tie_col="eid")
    rows = [(r["user_id"], r["pt_idx"]) for r in out.take_all()]
    users = tbl["user_id"].to_numpy(zero_copy_only=False)
    for u in np.unique(users):
        m = int((users == u).sum())
        kept = sorted(i for uu, i in rows if uu == u)
        assert kept == ([0] if m == 1 else [0, m - 1])
