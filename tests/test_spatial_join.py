"""Rectangle-intersection join (stages/spatial.bbox_join) vs a brute
cross-product oracle, and nearest-site assignment tie-break pinning."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.spatial import bbox_join, nearest_site


def _rects(rng, n, span=800, wmax=120):
    x0 = rng.integers(0, span, n)
    y0 = rng.integers(0, span, n)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "x0": pa.array(x0.astype(np.int64)),
        "y0": pa.array(y0.astype(np.int64)),
        "x1": pa.array((x0 + rng.integers(0, wmax, n)).astype(np.int64)),
        "y1": pa.array((y0 + rng.integers(0, wmax, n)).astype(np.int64)),
    })


def _brute(a, b):
    out = set()
    ad, bd = a.to_pydict(), b.to_pydict()
    for i in range(len(ad["id"])):
        for j in range(len(bd["id"])):
            dx = (min(ad["x1"][i], bd["x1"][j])
                  - max(ad["x0"][i], bd["x0"][j]))
            dy = (min(ad["y1"][i], bd["y1"][j])
                  - max(ad["y0"][i], bd["y0"][j]))
            if dx >= 0 and dy >= 0:
                out.add((ad["id"][i], bd["id"][j],
                         (dx + 1) * (dy + 1)))
    return out


def test_bbox_join_parity():
    rng = np.random.default_rng(3)
    a, b = _rects(rng, 90), _rects(rng, 110)
    got = bbox_join(rd.from_arrow(a), rd.from_arrow(b),
                    cell=64, buckets=5).to_pandas()
    pairs = set(zip(got.a_id.astype(int), got.b_id.astype(int),
                    got.inter_area.astype(int)))
    assert len(pairs) == len(got), "duplicate pairs emitted"
    assert pairs == _brute(a, b)


def test_bbox_join_cell_spanning():
    # rects far larger than a cell must still pair exactly once
    a = pa.table({"id": pa.array([1], type=pa.int64()),
                  "x0": pa.array([0], type=pa.int64()),
                  "y0": pa.array([0], type=pa.int64()),
                  "x1": pa.array([500], type=pa.int64()),
                  "y1": pa.array([500], type=pa.int64())})
    b = pa.table({"id": pa.array([7], type=pa.int64()),
                  "x0": pa.array([250], type=pa.int64()),
                  "y0": pa.array([250], type=pa.int64()),
                  "x1": pa.array([900], type=pa.int64()),
                  "y1": pa.array([900], type=pa.int64())})
    got = bbox_join(rd.from_arrow(a), rd.from_arrow(b),
                    cell=50, buckets=3).to_pandas()
    assert len(got) == 1
    assert int(got.inter_area.iloc[0]) == 251 * 251


def test_nearest_site_ties_to_lowest_id():
    pts = pa.table({"id": pa.array([0], type=pa.int64()),
                    "x": pa.array([5], type=pa.int64()),
                    "y": pa.array([0], type=pa.int64())})
    sites = np.array([[0, 0], [10, 0]])  # equidistant from x=5
    out = nearest_site(rd.from_arrow(pts), sites,
                       np.array([4, 2])).to_pandas()
    assert int(out.site_id.iloc[0]) == 2  # lowest id wins
    assert int(out.d2.iloc[0]) == 25
