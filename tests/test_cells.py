import numpy as np

from osmium_tool_ray.functions import cells


def test_roundtrip_xy():
    rng = np.random.default_rng(42)
    for level in (0, 1, 7, 15, 29):
        n = 1 << level
        x = rng.integers(0, n, size=200)
        y = rng.integers(0, n, size=200)
        c = cells.xy_to_cell(x, y, level)
        rx, ry = cells.cell_to_xy(c)
        assert (rx == x).all() and (ry == y).all()
        assert (cells.cell_level(c) == level).all()


def test_encode_corners():
    lon = np.array([-180.0, 0.0, 179.999, 180.0])
    lat = np.array([-90.0, 0.0, 89.999, 90.0])
    for level in (1, 8):
        n = 1 << level
        x, y = cells.lonlat_to_xy(lon, lat, level)
        assert x[0] == 0 and y[0] == 0
        assert x[1] == n // 2 and y[1] == n // 2
        assert x[3] == n - 1 and y[3] == n - 1  # clamped


def test_distinct_levels_never_collide():
    c1 = cells.cell_encode(np.array([10.0]), np.array([20.0]), 5)
    c2 = cells.cell_encode(np.array([10.0]), np.array([20.0]), 6)
    assert c1[0] != c2[0]


def test_parent():
    c = cells.cell_encode(np.array([12.3]), np.array([45.6]), 12)
    p = cells.cell_parent(c, 8)
    assert cells.cell_level(p)[0] == 8
    # parent rect must contain the child rect
    lon0, lat0, lon1, lat1 = cells.cell_bounds(c)
    plon0, plat0, plon1, plat1 = cells.cell_bounds(p)
    assert plon0 <= lon0 and plat0 <= lat0 and plon1 >= lon1 and plat1 >= lat1


def test_neighbors_wrap_antimeridian():
    level = 4
    c = cells.cell_encode(np.array([-179.9]), np.array([0.0]), level)  # x == 0 col
    nb = cells.cell_neighbors(c, ring=1)[0]
    xs, _ = cells.cell_to_xy(nb)
    n = 1 << level
    assert (xs == n - 1).any()  # wrapped to the last column across the antimeridian


def test_cover_bbox():
    cc = cells.cover_bbox(-1.0, -1.0, 1.0, 1.0, 8)
    lon0, lat0, lon1, lat1 = cells.cell_bounds(cc)
    # every covering cell intersects the bbox
    assert (lon1 >= -1.0).all() and (lon0 <= 1.0).all()
    assert (lat1 >= -1.0).all() and (lat0 <= 1.0).all()
    # and the bbox corners are covered
    for qlon, qlat in [(-1.0, -1.0), (1.0, 1.0), (0.0, 0.0)]:
        q = cells.cell_encode(np.array([qlon]), np.array([qlat]), 8)[0]
        assert q in set(cc.tolist())
