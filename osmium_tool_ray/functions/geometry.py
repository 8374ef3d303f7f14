"""Ring geometry helpers mirroring the reference's geometry_util.

Semantics ported (NOT code): shoelace double-area accumulated in float64 in
vertex order (/root/reference/src/extract/geometry_util.cpp:5-22), CCW test
(`is_ccw` = double_area > 0, geometry_util.hpp), and the fixed-point int32
coordinate model of osmium::Location (lon/lat * 1e7, rounded half away from
zero), which the exact PIP kernel in pip.py requires for row-for-row parity
with /root/reference/src/extract/extract_polygon.cpp.
"""

from __future__ import annotations

import numpy as np

COORD_PRECISION = 10_000_000  # osmium::Location coordinate_precision


def to_fix(deg) -> np.ndarray:
    """Degrees float64 -> fixed-point int32-range int64 (round half away from
    zero, like std::round in osmium Location::double_to_fix)."""
    d = np.asarray(deg, dtype=np.float64)
    return np.where(d >= 0,
                    np.floor(d * COORD_PRECISION + 0.5),
                    np.ceil(d * COORD_PRECISION - 0.5)).astype(np.int64)


def from_fix(fix) -> np.ndarray:
    return np.asarray(fix, dtype=np.float64) / COORD_PRECISION


def location_valid(lon_fix: np.ndarray, lat_fix: np.ndarray) -> np.ndarray:
    """osmium::Location::valid(): lon in [-180,180], lat in [-90,90]."""
    L = COORD_PRECISION
    return ((lon_fix >= -180 * L) & (lon_fix <= 180 * L)
            & (lat_fix >= -90 * L) & (lat_fix <= 90 * L))


def double_area(ring: np.ndarray) -> float:
    """2x signed shoelace area of a ring (float64 degrees, (k,2) lon/lat),
    accumulated in vertex order like calculate_double_area."""
    r = np.asarray(ring, dtype=np.float64)
    x, y = r[:, 0], r[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def is_ccw(ring: np.ndarray) -> bool:
    return double_area(ring) > 0


def ensure_closed(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if r.ndim != 2 or r.shape[1] != 2 or r.shape[0] < 3:
        raise ValueError("ring must be (k>=3, 2) lon/lat")
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def normalize_ring(ring: np.ndarray, outer: bool) -> np.ndarray:
    """Orientation-normalize: outer CCW, inner CW (the reference reverses
    wrong-wound GeoJSON rings, geojson_file_parser.cpp:101-124)."""
    r = ensure_closed(ring)
    if is_ccw(r) != outer:
        r = r[::-1].copy()
    return r
