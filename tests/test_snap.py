"""snap_to_segments (stages/spatial) vs a per-point reference scan,
including clamped endpoints, a degenerate zero-length segment, and
lowest-id tie-breaks."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.spatial import snap_to_segments


def _ref(px, py, segs, sids):
    best = None
    for (ax, ay, bx, by), sid in sorted(zip(segs.tolist(), sids.tolist()),
                                        key=lambda z: z[1]):
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        t = 0.0 if l2 == 0 else min(1.0, max(0.0, ((px - ax) * dx
                                                   + (py - ay) * dy) / l2))
        ex, ey = (px - ax) - t * dx, (py - ay) - t * dy
        d2 = ex * ex + ey * ey
        if best is None or d2 < best[1]:
            best = (sid, d2, t)
    return best


def test_snap_matches_reference():
    rng = np.random.default_rng(17)
    segs = rng.integers(0, 200, (9, 4)).astype(np.float64)
    segs[3, 2:] = segs[3, :2]            # zero-length segment
    sids = np.arange(9, dtype=np.int64)
    pts = rng.integers(0, 200, (300, 2)).astype(np.int64)
    tbl = pa.table({"id": pa.array(np.arange(300, dtype=np.int64)),
                    "x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1])})
    out = snap_to_segments(rd.from_arrow(tbl).repartition(4), segs, sids) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    for r in out.itertuples():
        sid, d2, t = _ref(float(pts[r.id, 0]), float(pts[r.id, 1]),
                          segs, sids)
        assert int(r.seg_id) == sid
        assert float(r.d2) == d2
        assert int(r.t1000) == int(np.floor(t * 1000.0))


def test_tie_breaks_to_lowest_id():
    # two identical segments, distinct ids
    segs = np.array([[0, 0, 10, 0], [0, 0, 10, 0]], dtype=np.float64)
    tbl = pa.table({"id": pa.array([0], type=pa.int64()),
                    "x": pa.array([5], type=pa.int64()),
                    "y": pa.array([3], type=pa.int64())})
    out = snap_to_segments(rd.from_arrow(tbl), segs,
                           np.array([8, 2])).to_pandas()
    assert int(out.seg_id.iloc[0]) == 2
    assert float(out.d2.iloc[0]) == 9.0
