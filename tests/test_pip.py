import numpy as np

from osmium_tool_ray.functions.geometry import to_fix
from osmium_tool_ray.functions.pip import BandedPolygonIndex, bbox_contains_fix

SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]])


def test_square_basic():
    ix = BandedPolygonIndex([SQUARE])
    lon = np.array([5.0, -1.0, 11.0, 5.0, 5.0])
    lat = np.array([5.0, 5.0, 5.0, -0.1, 10.1])
    assert ix.contains(lon, lat).tolist() == [True, False, False, False, False]


def test_vertex_point_is_inside():
    # extract_polygon.cpp:137-139 — a point equal to a segment endpoint is inside
    ix = BandedPolygonIndex([SQUARE])
    lon = np.array([0.0, 10.0, 10.0, 0.0])
    lat = np.array([0.0, 0.0, 10.0, 10.0])
    assert ix.contains(lon, lat).all()


def test_hole_excluded():
    inner = np.array([[4.0, 4.0], [4.0, 6.0], [6.0, 6.0], [6.0, 4.0], [4.0, 4.0]])  # CW
    ix = BandedPolygonIndex([SQUARE, inner])
    lon = np.array([5.0, 3.0, 4.0])
    lat = np.array([5.0, 5.0, 5.0])
    res = ix.contains(lon, lat)
    assert res.tolist()[:2] == [False, True]
    # point on the hole's boundary vertex chain: (4,4) is an endpoint -> inside
    assert ix.contains(np.array([4.0]), np.array([4.0]))[0]


def test_concave_polygon():
    # C-shape: outer boundary with a notch
    ring = np.array([[0, 0], [10, 0], [10, 3], [3, 3], [3, 7], [10, 7],
                     [10, 10], [0, 10], [0, 0]], dtype=float)
    ix = BandedPolygonIndex([ring])
    assert ix.contains(np.array([5.0]), np.array([5.0]))[0] == False  # in the notch
    assert ix.contains(np.array([1.0]), np.array([5.0]))[0] == True
    assert ix.contains(np.array([5.0]), np.array([1.0]))[0] == True
    assert ix.contains(np.array([5.0]), np.array([9.0]))[0] == True


def test_many_points_match_naive():
    rng = np.random.default_rng(7)
    # irregular star-ish polygon
    ang = np.sort(rng.uniform(0, 2 * np.pi, 40))
    rad = rng.uniform(2, 10, 40)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    ix = BandedPolygonIndex([ring])
    lon = rng.uniform(-12, 12, 5000)
    lat = rng.uniform(-12, 12, 5000)
    got = ix.contains(lon, lat)

    # naive float ray-casting (matplotlib-style) as an independent check
    def naive(px, py):
        x, y = ring[:, 0], ring[:, 1]
        inside = np.zeros(len(px), dtype=bool)
        for i in range(len(x) - 1):
            x1, y1, x2, y2 = x[i], y[i], x[i + 1], y[i + 1]
            cond = (y1 > py) != (y2 > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            inside ^= cond & (px < xint)
        return inside

    want = naive(lon, lat)
    # allow disagreement only within a hair of an edge (fixed-point rounding)
    diff = got != want
    assert diff.mean() < 0.001


def test_band_structure_many_segments():
    # >10 segments per band path: circle with 500 vertices
    t = np.linspace(0, 2 * np.pi, 501)
    ring = np.stack([5 * np.cos(t), 5 * np.sin(t)], axis=1)
    ring[-1] = ring[0]
    ix = BandedPolygonIndex([ring])
    assert ix.num_bands == 50
    lon = np.array([0.0, 4.9, 5.1, 0.0, 0.0])
    lat = np.array([0.0, 0.0, 0.0, 4.9, -5.1])
    assert ix.contains(lon, lat).tolist() == [True, True, False, True, False]


def test_bbox_contains():
    got = bbox_contains_fix(
        to_fix(np.array([0.5, 1.5, -0.5, 0.0, 1.5])),
        to_fix(np.array([0.5, 0.5, 0.5, 0.0, 10.0])),
        int(to_fix(0.0)), int(to_fix(0.0)), int(to_fix(1.5)), int(to_fix(10.0)))
    # inclusive on all edges (osmium Box::contains)
    assert got.tolist() == [True, True, False, True, True]


def test_invalid_location_outside():
    ix = BandedPolygonIndex([SQUARE])
    assert not ix.contains(np.array([190.0]), np.array([5.0]))[0]
    assert not bbox_contains_fix(to_fix(np.array([190.0])), to_fix(np.array([5.0])),
                                 -10**9, -10**9, 2 * 10**9, 10**9)[0]
