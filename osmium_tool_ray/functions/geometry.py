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


def assemble_rings(fragments: list) -> tuple[list, list]:
    """Stitch open way fragments end-to-end into closed rings — the osmium
    area-assembler core (semantics of the reference's segment joining,
    /root/reference/src/extract/osm_file_parser.cpp:48-92, and the
    multipolygon assembly feeding export, command_export.cpp:599-617):
    a fragment extends the open chain when one of its endpoints equals the
    chain's current end (EXACT equality in osmium fixed-point
    coordinates); a fragment may join reversed; a chain that returns to
    its starting vertex becomes a ring.

    Deterministic: chains start at the lexicographically-smallest unused
    fragment and always extend with the smallest matching candidate.

    Returns (rings, leftover): closed rings as (k, 2) float64 arrays
    (first vertex == last vertex), and the indices of fragments that could
    not be placed in any closed ring."""
    frs = [np.asarray(f, dtype=np.float64) for f in fragments]
    fixed = [to_fix(f) for f in frs]

    def key(i):
        return (tuple(fixed[i][0]), tuple(fixed[i][-1]), i)

    unused = set(range(len(frs)))
    rings: list = []
    leftover: list = []
    while unused:
        start = min(unused, key=key)
        unused.remove(start)
        if len(frs[start]) >= 4 and (fixed[start][0] == fixed[start][-1]).all():
            # same contract as the stitched branch: >=4 points (a 3-point
            # [A,B,A] "ring" is zero-area) and an EXACT float
            # first-vertex == last-vertex (closure was decided in
            # fixed-point; the float tail may differ by <1 unit)
            ring = frs[start]
            if not np.array_equal(ring[0], ring[-1]):
                ring = ring.copy()
                ring[-1] = ring[0]
            rings.append(ring)
            continue
        chain = [frs[start]]
        used_here = [start]
        chain_start = fixed[start][0]
        cur_end = fixed[start][-1]
        closed = False
        while True:
            cands = []
            for j in unused:
                if (fixed[j][0] == cur_end).all():
                    cands.append((key(j), j, False))
                elif (fixed[j][-1] == cur_end).all():
                    cands.append((key(j), j, True))
            if not cands:
                break
            _, j, rev = min(cands)
            unused.remove(j)
            used_here.append(j)
            seg = frs[j][::-1] if rev else frs[j]
            chain.append(seg[1:])          # junction vertex already present
            cur_end = to_fix(seg[-1])
            if (cur_end == chain_start).all():
                closed = True
                break
        if closed:
            ring = np.vstack(chain)
            if len(ring) >= 4:
                # closure was decided in fixed-point; snap the float tail
                # onto the head so the returned ring honours the
                # first-vertex == last-vertex contract exactly
                if not np.array_equal(ring[0], ring[-1]):
                    ring = ring.copy()
                    ring[-1] = ring[0]
                rings.append(ring)
            else:
                leftover.extend(used_here)
        else:
            leftover.extend(used_here)
    return rings, sorted(leftover)


def point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    """Even-odd crossing test of one point against a closed ring (float
    degrees) — used only for outer/inner nesting classification during
    area assembly (boundary points are don't-care there)."""
    x, y = float(pt[0]), float(pt[1])
    r = np.asarray(ring, dtype=np.float64)
    x1, y1 = r[:-1, 0], r[:-1, 1]
    x2, y2 = r[1:, 0], r[1:, 1]
    straddle = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    return bool(np.count_nonzero(straddle & (xs > x)) % 2)
