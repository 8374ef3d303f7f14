"""Tile pyramid (stages/tiles.tile_pyramid): every level equals a
direct aggregation at that level; parent counts are the sum of their
four children."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.tiles import tile_pyramid


def test_tile_pyramid_levels(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    lon = rng.uniform(-180, 180, 900)
    lat = rng.uniform(-90, 90, 900)
    tbl = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    out = tile_pyramid(rd.from_arrow(tbl).repartition(4), max_level=4)
    got = {}
    for r in out.take_all():
        got[(r["level"], r["cell_x"], r["cell_y"])] = r["n"]

    for level in range(4, -1, -1):
        n = 1 << level
        x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(int),
                    0, n - 1)
        y = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(int),
                    0, n - 1)
        ref = {}
        for xi, yi in zip(x, y):
            ref[(level, xi, yi)] = ref.get((level, xi, yi), 0) + 1
        lvl_got = {k: v for k, v in got.items() if k[0] == level}
        assert lvl_got == ref, level

    # parent = sum of children
    for (lvl, cx, cy), v in got.items():
        if lvl == 4:
            continue
        kids = sum(got.get((lvl + 1, 2 * cx + dx, 2 * cy + dy), 0)
                   for dx in (0, 1) for dy in (0, 1))
        assert kids == v
    assert got[(0, 0, 0)] == 900


def test_hotspot_tiles_exact_rule(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.tiles import hotspot_tiles

    rng = np.random.default_rng(9)
    # uniform background + two planted dense clusters
    lon = rng.uniform(-180, 180, 800).tolist()
    lat = rng.uniform(-90, 90, 800).tolist()
    lon += [10.0 + rng.uniform(0, 0.1) for _ in range(120)]
    lat += [20.0 + rng.uniform(0, 0.1) for _ in range(120)]
    lon += [-100.0 + rng.uniform(0, 0.1) for _ in range(80)]
    lat += [-40.0 + rng.uniform(0, 0.1) for _ in range(80)]
    tbl = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    level = 5
    out = hotspot_tiles(rd.from_arrow(tbl).repartition(4), level=level,
                        z=2)
    got = sorted((r["cell_x"], r["cell_y"], r["n_images"])
                 for r in out.take_all())

    # reference: exact integer rule over occupied-tile counts
    n = 1 << level
    x = np.clip(np.floor((np.asarray(lon) + 180.0) / 360.0 * n)
                .astype(int), 0, n - 1)
    y = np.clip(np.floor((np.asarray(lat) + 90.0) / 180.0 * n)
                .astype(int), 0, n - 1)
    cnt = {}
    for xi, yi in zip(x, y):
        cnt[(xi, yi)] = cnt.get((xi, yi), 0) + 1
    vals = list(cnt.values())
    N, S, Q = len(vals), sum(vals), sum(v * v for v in vals)
    want = sorted((cx, cy, v) for (cx, cy), v in cnt.items()
                  if v * N > S and (v * N - S) ** 2 > 4 * (N * Q - S * S))
    assert got == want
    # the two planted clusters are detected
    assert any(v >= 80 for _, _, v in got)
    assert len(got) >= 2
