"""hex_encode (functions/cells.hex_encode): Voronoi assignment onto the
offset hex lattice, verified against an exhaustive nearest-center brute
force over a generous candidate window with the documented tie rules
(equal squared distance -> lower row; within a row the halfway point
rounds to the larger column index)."""
import numpy as np
import pytest

from osmium_tool_ray.functions.cells import hex_encode


def _brute(x, y, w=100, h=87):
    j0 = np.floor_divide(y, h)
    bd = np.full(len(x), np.int64(1) << 62)
    bi = np.zeros(len(x), np.int64)
    bj = np.zeros(len(x), np.int64)
    for dj in (-2, -1, 0, 1, 2, 3):
        j = j0 + dj
        ox = (j & 1) * (w // 2)
        ii = np.floor_divide(2 * (x - ox) + w, 2 * w)
        for di in (-2, -1, 0, 1, 2):
            i = ii + di
            d2 = (x - (i * w + ox)) ** 2 + (y - j * h) ** 2
            upd = (d2 < bd) | ((d2 == bd) & ((j < bj) |
                                             ((j == bj) & (i > bi))))
            bd = np.where(upd, d2, bd)
            bi = np.where(upd, i, bi)
            bj = np.where(upd, j, bj)
    return bi, bj


def test_hex_encode_is_nearest_center_fuzz():
    rng = np.random.default_rng(7)
    x = rng.integers(-18000, 18000, 100_000)
    y = rng.integers(-8500, 8500, 100_000)
    hq, hr = hex_encode(x, y)
    bi, bj = _brute(x, y)
    assert (hq == bi).all() and (hr == bj).all()


def test_hex_encode_boundary_ties_are_deterministic():
    # x exactly halfway between two row-0 centers (0 and 100): rounds UP
    hq, hr = hex_encode(np.array([50]), np.array([0]))
    assert (hq[0], hr[0]) == (1, 0)
    # centers (0,0) and (50,87): their perpendicular bisector point with
    # equal integer d2 must resolve to the LOWER row
    x, y = np.array([25]), np.array([43])  # d2: 25^2+43^2 vs 25^2+44^2
    hq, hr = hex_encode(x, y)
    bi, bj = _brute(x, y)
    assert (hq[0], hr[0]) == (bi[0], bj[0])
    # construct an exact cross-row tie: (x,y) with dx0^2+dy0^2 == dx1^2+dy1^2
    # centers (0,0) row 0 and (50,87) row 1: solve 2500 - 100x + 7569
    #  - 174y == 0 -> x=13, y=50.4... use centers (0,0) and (-50,87):
    # 2500 + 100x + 7569 - 174y = 0 -> x = -43, y = 33: d2 = 43^2+33^2
    # = 2938 vs (-43+50)^2 + (33-87)^2 = 49+2916 = 2965 -- not a tie;
    # fall back to scanning for true ties and assert the lower row wins
    xs = np.arange(-200, 200)
    ys = np.full_like(xs, 43)
    hq, hr = hex_encode(xs, ys)
    bi, bj = _brute(xs, ys)
    assert (hq == bi).all() and (hr == bj).all()


def test_hex_encode_validates_lattice():
    with pytest.raises(ValueError):
        hex_encode(np.array([0]), np.array([0]), w=99)
    with pytest.raises(ValueError):
        hex_encode(np.array([0]), np.array([0]), w=100, h=50)
