"""3x3 raster smoothing (stages/raster.smooth_cell_counts) vs a dense
numpy convolution on a small grid."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.raster import smooth_cell_counts


def test_smooth_matches_dense_convolution(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(6)
    level = 3                      # 8x8 grid
    n = 1 << level
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    tbl = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    out = smooth_cell_counts(rd.from_arrow(tbl).repartition(4),
                             level=level)
    got = {(r["cell_x"], r["cell_y"]): r["smoothed"]
           for r in out.take_all()}

    # dense reference: raw counts then clipped 3x3 box sum
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(int), 0, n - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(int), 0, n - 1)
    raw = np.zeros((n, n), dtype=np.int64)
    np.add.at(raw, (x, y), 1)
    dense = np.zeros_like(raw)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            sx = slice(max(dx, 0), n + min(dx, 0))
            tx = slice(max(-dx, 0), n + min(-dx, 0))
            sy = slice(max(dy, 0), n + min(dy, 0))
            ty = slice(max(-dy, 0), n + min(-dy, 0))
            dense[tx, ty] += raw[sx, sy]
    for cx in range(n):
        for cy in range(n):
            assert got.get((cx, cy), 0) == dense[cx, cy], (cx, cy)
    # sparse output: only cells receiving mass appear
    assert all(v > 0 for v in got.values())
