"""Hierarchical spatial cell index (Z-order / quadtree over lon-lat), numpy.

From-scratch S2/H3-style cell scheme used for spatial-join prefiltering,
tile assignment and kNN candidate gathering (per BASELINE.json north_rule:
"H3/S2-encoded in vectorized map_batches over zero-copy Arrow").

Design:
  * level L in [0, 29]; the world (lon [-180,180) x lat [-90,90)) is a
    2^L x 2^L grid of equal-degree cells.
  * cell id (uint64, stored as int64 in Arrow) = morton(x, y) << 5 | L
    where morton interleaves x (even bits) and y (odd bits).
  * Cells at different levels never collide (level is part of the id);
    parent/child are O(1) bit ops, neighbors wrap in x (antimeridian) and
    clamp in y, mirroring how the reference treats lon wrap-around in its
    antimeridian fixtures (/root/reference/test/extract/CMakeLists.txt:53-66).

Everything is vectorized uint64 numpy; no Python loops over rows.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29

_U = np.uint64


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so they occupy even positions."""
    v = v.astype(_U) & _U(0xFFFFFFFF)
    v = (v | (v << _U(16))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v << _U(8))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U(2))) & _U(0x3333333333333333)
    v = (v | (v << _U(1))) & _U(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather even-position bits into the low 32."""
    v = v.astype(_U) & _U(0x5555555555555555)
    v = (v | (v >> _U(1))) & _U(0x3333333333333333)
    v = (v | (v >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _U(4))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v >> _U(8))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v >> _U(16))) & _U(0x00000000FFFFFFFF)
    return v


def lonlat_to_xy(lon: np.ndarray, lat: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Grid coordinates at `level`. floor semantics, clamped to the grid.

    lon=180.0 maps onto the last column (same cell as just-below-180), and
    lat=90.0 onto the top row, so every valid location has a cell.
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    n = np.int64(1) << np.int64(level)
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def xy_to_cell(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    return ((_part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << _U(1))) << _U(5)) | _U(level)


def cell_encode(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """lon/lat float64 arrays -> uint64 cell ids at `level`."""
    x, y = lonlat_to_xy(lon, lat, level)
    return xy_to_cell(x, y, level)


def cell_level(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=_U) & _U(0x1F)).astype(np.int64)


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(cell, dtype=_U) >> _U(5)
    return _compact1by1(m).astype(np.int64), _compact1by1(m >> _U(1)).astype(np.int64)


def cell_parent(cell: np.ndarray, parent_level: int) -> np.ndarray:
    """Ancestor cell at `parent_level` (must be <= the cell's own level)."""
    x, y = cell_to_xy(cell)
    lvl = cell_level(cell)
    shift = (lvl - parent_level).astype(np.int64)
    if (shift < 0).any():
        raise ValueError("parent_level deeper than cell level")
    return xy_to_cell(x >> shift, y >> shift, parent_level)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) float64 of each cell rectangle."""
    x, y = cell_to_xy(cell)
    lvl = cell_level(cell)
    n = (np.int64(1) << lvl).astype(np.float64)
    w, h = 360.0 / n, 180.0 / n
    lon0 = x * w - 180.0
    lat0 = y * h - 90.0
    return lon0, lat0, lon0 + w, lat0 + h


def cell_neighbors(cell: np.ndarray, ring: int = 1) -> np.ndarray:
    """k-ring neighborhood (including the cell itself): shape (n, (2r+1)^2).

    x wraps across the antimeridian; y rows outside [0, 2^L) are returned as
    the cell itself (duplicates are fine for candidate gathering — callers
    dedup via groupby).
    """
    cell = np.atleast_1d(np.asarray(cell, dtype=_U))
    x, y = cell_to_xy(cell)
    lvl = cell_level(cell)
    n = np.int64(1) << lvl
    offs = np.arange(-ring, ring + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    dx, dy = dx.ravel(), dy.ravel()
    nx = (x[:, None] + dx[None, :]) % n[:, None]
    ny = y[:, None] + dy[None, :]
    bad = (ny < 0) | (ny >= n[:, None])
    ny = np.where(bad, y[:, None], ny)
    nx = np.where(bad, x[:, None], nx)
    out = np.empty(nx.shape, dtype=_U)
    for i, L in enumerate(np.unique(lvl)):  # few distinct levels in practice
        m = lvl == L
        out[m] = xy_to_cell(nx[m], ny[m], int(L))
    return out


def cover_bbox(lon_min: float, lat_min: float, lon_max: float, lat_max: float,
               level: int) -> np.ndarray:
    """All cells at `level` intersecting the closed bbox. No antimeridian split
    here — callers split wrap-around boxes into two first."""
    n = np.int64(1) << np.int64(level)
    x0, y0 = lonlat_to_xy(np.array([lon_min]), np.array([lat_min]), level)
    x1, y1 = lonlat_to_xy(np.array([lon_max]), np.array([lat_max]), level)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return xy_to_cell(gx.ravel(), gy.ravel(), level)


_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz",
                           dtype=np.uint8)


def geohash_encode(lon: np.ndarray, lat: np.ndarray,
                   precision: int = 9) -> np.ndarray:
    """Vectorized geohash encoding (Niemeyer 2008 public-domain scheme):
    5*precision alternating lon/lat bisection bits, base32-mapped
    MSB-first. 5p vectorized numpy passes per batch, no per-row Python;
    precision <= 12 (60 bits fit uint64). Returns a <U{p} string
    array."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = len(lon)
    val = np.zeros(n, dtype=np.uint64)
    lo_x = np.full(n, -180.0)
    hi_x = np.full(n, 180.0)
    lo_y = np.full(n, -90.0)
    hi_y = np.full(n, 90.0)
    for i in range(5 * precision):
        if i % 2 == 0:                       # even bit: longitude
            mid = (lo_x + hi_x) * 0.5
            bit = lon >= mid
            lo_x = np.where(bit, mid, lo_x)
            hi_x = np.where(bit, hi_x, mid)
        else:                                # odd bit: latitude
            mid = (lo_y + hi_y) * 0.5
            bit = lat >= mid
            lo_y = np.where(bit, mid, lo_y)
            hi_y = np.where(bit, hi_y, mid)
        val = (val << np.uint64(1)) | bit.astype(np.uint64)
    chars = np.empty((n, precision), dtype=np.uint8)
    for c in range(precision):
        shift = np.uint64(5 * (precision - 1 - c))
        chars[:, c] = _GEOHASH32[((val >> shift)
                                  & np.uint64(0x1F)).astype(np.int64)]
    return chars.reshape(n * precision).view(f"S{precision}") \
        .astype(str)


def hex_encode(x: np.ndarray, y: np.ndarray,
               w: int = 100, h: int = 87) -> tuple[np.ndarray, np.ndarray]:
    """H3-style hexagonal binning: assign integer points to the Voronoi
    cell of an offset hex lattice — centers at (i*w + (j&1)*w/2, j*h) —
    entirely in int64 (pointy-top hexagons when h ≈ w*sqrt(3)/2; the
    87/100 default is that ratio in centi-degree units, kept integral so
    the SQL twin is exact).

    Assignment needs only the two bracketing rows: for y in
    [j0*h, (j0+1)*h) any row-(j0-1) center is farther than the best
    row-j0 center because (dy+h)^2 - dy^2 = h^2 + 2*h*dy >= h^2 > (w/2)^2
    whenever h > w/2 — true for every hex-ish aspect. Ties in squared
    distance resolve to the LOWER row (candidate A wins unless strictly
    closer), matching a CASE WHEN d1 < d0 SQL twin; within a row the
    center index i = floor((2*(x-ox)+w) / (2*w)) rounds half-up.

    `w` must be even so the odd-row offset w/2 stays integral.
    Returns (hq, hr) = (center column index i, row index j), int64.
    """
    if w % 2 or h <= w // 2:
        raise ValueError("w must be even and h > w/2")
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    j0 = np.floor_divide(y, h)
    out_i = np.empty(len(x), dtype=np.int64)
    out_j = np.empty(len(x), dtype=np.int64)
    best = None
    for k, j in enumerate((j0, j0 + 1)):
        ox = (j & 1) * (w // 2)
        i = np.floor_divide(2 * (x - ox) + w, 2 * w)
        dx = x - (i * w + ox)
        dy = y - j * h
        d2 = dx * dx + dy * dy
        if k == 0:
            out_i[:] = i
            out_j[:] = j
            best = d2
        else:
            closer = d2 < best
            out_i[closer] = i[closer]
            out_j[closer] = j[closer]
    return out_i, out_j
