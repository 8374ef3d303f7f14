"""Banded ray-casting point-in-polygon kernel, vectorized in numpy.

Exact semantic port (NOT a code port) of the reference's PIP index
(/root/reference/src/extract/extract_polygon.cpp):

  * envelope prefilter: invalid location or outside the (inclusive) bbox of
    all ring points -> outside (contains() lines 126-131).
  * y-range split into equal bands: num_bands = clamp(n_segments/10, 1, 10000),
    dy = ceil-div of the y extent (lines 77-100); each segment is registered
    in every band its y-range overlaps.
  * per point: pick band = (y - y_min) / dy, test only that band's segments.
  * a point equal to a segment ENDPOINT is inside (lines 137-139).
  * crossing rule is pnpoly with exact int64 products on the fixed-point
    int32 coordinates: if (y2>y)!=(y1>y), comp = tx*ay < ax*ty, toggle when
    (ay>0)==comp (lines 140-151). int64 products are allowed to wrap exactly
    as the C++ build does on two's-complement hardware; numpy uint64-view
    multiplication reproduces that bit-for-bit.

All coordinates here are fixed-point int64 holding int32-range values
(degrees * 1e7, see functions/geometry.py). The index is built once (driver
or actor __init__) and is cheap to pickle into actor-pool state.
"""

from __future__ import annotations

import numpy as np

from .geometry import location_valid, to_fix

SEGMENTS_PER_BAND = 10  # extract_polygon.cpp:77
MAX_BANDS = 10_000      # extract_polygon.cpp:78


def _wrap_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """int64 * int64 with two's-complement wraparound (matches C++ on x86)."""
    return (a.view(np.uint64) * b.view(np.uint64)).view(np.int64)


class BandedPolygonIndex:
    """PIP index over the pooled segments of all rings of a (multi)polygon.

    rings: iterable of (k, 2) float64 lon/lat arrays, each closed
    (first == last). Outer and inner rings are pooled into one segment list
    exactly like the reference pools outer_rings + inner_rings
    (extract_polygon.cpp:66-73); crossing parity handles holes for free.
    """

    def __init__(self, rings):
        segs = []
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if r.shape[0] < 2:
                raise ValueError("Ring without enough points.")
            fx, fy = to_fix(r[:, 0]), to_fix(r[:, 1])
            segs.append(np.stack([fx[:-1], fy[:-1], fx[1:], fy[1:]], axis=1))
        if not segs:
            raise ValueError("polygon with no rings")
        S = np.concatenate(segs, axis=0)  # (n, 4): x1 y1 x2 y2
        self.x_min = int(min(S[:, 0].min(), S[:, 2].min()))
        self.x_max = int(max(S[:, 0].max(), S[:, 2].max()))
        self.y_min = int(min(S[:, 1].min(), S[:, 3].min()))
        self.y_max = int(max(S[:, 1].max(), S[:, 3].max()))

        n_segs = S.shape[0]
        num_bands = n_segs // SEGMENTS_PER_BAND
        num_bands = max(1, min(num_bands, MAX_BANDS))
        self.num_bands = num_bands
        # reference: dy = (y_max - y_min + num_bands - 1) / num_bands; guard
        # dy >= 1 for degenerate zero-height polygons
        self.dy = max(1, (self.y_max - self.y_min + num_bands - 1) // num_bands)

        ymin_seg = np.minimum(S[:, 1], S[:, 3])
        ymax_seg = np.maximum(S[:, 1], S[:, 3])
        band_min = ((ymin_seg - self.y_min) // self.dy).astype(np.int64)
        band_max = ((ymax_seg - self.y_min) // self.dy).astype(np.int64)
        # bands vector has num_bands+1 slots (extract_polygon.cpp:85 resize(num_bands+1))
        counts = (band_max - band_min + 1)
        seg_idx = np.repeat(np.arange(n_segs), counts)
        band_of = np.concatenate([np.arange(b0, b1 + 1) for b0, b1 in zip(band_min, band_max)]) \
            if n_segs else np.empty(0, np.int64)
        order = np.argsort(band_of, kind="stable")
        band_sorted = band_of[order]
        self._seg_by_band = S[seg_idx[order]]
        self._band_offsets = np.searchsorted(band_sorted, np.arange(self.num_bands + 2))

    def contains_fix(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized contains() over fixed-point int64 coords. Returns bool."""
        px = np.asarray(px, dtype=np.int64)
        py = np.asarray(py, dtype=np.int64)
        out = np.zeros(px.shape[0], dtype=bool)
        cand = (location_valid(px, py)
                & (px >= self.x_min) & (px <= self.x_max)
                & (py >= self.y_min) & (py <= self.y_max))
        if not cand.any():
            return out
        idx = np.nonzero(cand)[0]
        band = (py[idx] - self.y_min) // self.dy
        # group query points by band, one vectorized (P x S) pass per band
        order = np.argsort(band, kind="stable")
        idx, band = idx[order], band[order]
        starts = np.searchsorted(band, np.unique(band))
        bounds = np.append(starts, len(band))
        for k, b in enumerate(np.unique(band)):
            sl = slice(bounds[k], bounds[k + 1])
            pidx = idx[sl]
            s0, s1 = self._band_offsets[b], self._band_offsets[b + 1]
            segs = self._seg_by_band[s0:s1]
            if segs.shape[0] == 0:
                continue
            out[pidx] = self._test_band(px[pidx], py[pidx], segs)
        return out

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return self.contains_fix(to_fix(lon), to_fix(lat))

    @staticmethod
    def _test_band(px, py, segs, chunk: int = 8192):
        res = np.empty(px.shape[0], dtype=bool)
        x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
        for c0 in range(0, px.shape[0], chunk):
            p = slice(c0, c0 + chunk)
            X, Y = px[p][:, None], py[p][:, None]
            at_end = ((X == x1) & (Y == y1)) | ((X == x2) & (Y == y2))
            crossing = (y2[None, :] > Y) != (y1[None, :] > Y)
            ax = x1 - x2
            ay = y1 - y2
            tx = X - x2[None, :]
            ty = Y - y2[None, :]
            comp = _wrap_mul(tx, np.broadcast_to(ay, tx.shape)) < \
                _wrap_mul(np.broadcast_to(ax, ty.shape), ty)
            toggle = crossing & ((ay[None, :] > 0) == comp)
            res[p] = at_end.any(axis=1) | (toggle.sum(axis=1) % 2 == 1)
        return res


def bbox_contains_fix(px: np.ndarray, py: np.ndarray,
                      x_min: int, y_min: int, x_max: int, y_max: int) -> np.ndarray:
    """ExtractBBox test (/root/reference/src/extract/extract_bbox.cpp:30-32):
    location valid AND inside the inclusive box."""
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    return (location_valid(px, py)
            & (px >= x_min) & (px <= x_max) & (py >= y_min) & (py <= y_max))
