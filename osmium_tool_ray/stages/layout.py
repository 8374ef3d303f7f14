"""Z-order (Morton) spatial layout + partition-pruned range scans.

The reference walks its input container start-to-finish for every extract
(1-3 full scans per strategy, src/extract/strategy_simple.cpp:110-119);
at 10^12 rows a full scan per region query is the dominant cost. This
stage gives the engine a *storage layout* answer: sort the corpus ONCE by
a Morton z-key (the same interleaved-bit order the cell index already
uses, functions/cells.py), record per-block key ranges, and serve every
later bbox query by pruning whole blocks against the query's z-ranges —
only blocks whose key interval intersects the query cover are scanned,
then the exact predicate runs inside the survivors.

Why z-order: a level-Lc cover cell owns exactly the contiguous Morton
interval [m << 2(L-Lc), (m+1) << 2(L-Lc)) of level-L keys, so a bbox
cover at a coarse level becomes a short sorted list of key ranges —
mergeable, broadcastable, and testable against per-block (min, max)
manifests without touching row data (the classic linearization used by
space-filling-curve layouts in public lakehouse literature).

At cluster scale the one-time sort is the only all-to-all; the manifest
is O(blocks) driver-side metadata (same shape as Parquet row-group
pruning), and every subsequent query is an embarrassingly parallel scan
of the surviving blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..blocks import _remote_num_rows  # noqa: F401  (re-export convenience)
from ..functions.cells import _part1by1, lonlat_to_xy


def morton_key(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Raw interleaved-bit Morton key at `level` (int64, no level tag —
    keys at one level sort contiguously per ancestor cell)."""
    x, y = lonlat_to_xy(lon, lat, level)
    return (_part1by1(x.astype(np.uint64))
            | (_part1by1(y.astype(np.uint64)) << np.uint64(1))).astype(np.int64)


def zorder_layout(ds, level: int = 12, lon_col: str = "lon",
                  lat_col: str = "lat", zkey_col: str = "zkey"):
    """Append the Morton key and globally sort by it — the one-time
    layout shuffle that buys block pruning for every later range query."""
    def tag(batch: pa.Table) -> pa.Table:
        z = morton_key(batch[lon_col].to_numpy(zero_copy_only=False),
                       batch[lat_col].to_numpy(zero_copy_only=False), level)
        return batch.append_column(zkey_col, pa.array(z))

    return ds.map_batches(tag, batch_format="pyarrow").sort(zkey_col)


def block_manifest(sorted_ds, zkey_col: str = "zkey"):
    """Per-block (min, max) z-key manifest of a z-sorted Dataset.

    Returns (refs, mins, maxs): the block object refs plus two int64
    arrays. Only 16 bytes/block reach the driver (zero-CPU tasks read the
    already-materialized blocks in place) — the same metadata shape as
    Parquet row-group statistics."""
    import ray

    @ray.remote(num_cpus=0)
    def minmax(tbl: pa.Table):
        if zkey_col not in tbl.schema.names or tbl.num_rows == 0:
            return (np.int64(1), np.int64(0))      # empty: min > max
        z = tbl[zkey_col].to_numpy(zero_copy_only=False)
        return (z.min(), z.max())

    refs = sorted_ds.to_arrow_refs()
    mm = ray.get([minmax.remote(r) for r in refs])
    mins = np.asarray([m[0] for m in mm], dtype=np.int64)
    maxs = np.asarray([m[1] for m in mm], dtype=np.int64)
    return refs, mins, maxs


def zranges_for_bbox(lon_min: float, lat_min: float, lon_max: float,
                     lat_max: float, level: int,
                     cover_level: int | None = None) -> np.ndarray:
    """Sorted, merged [start, end) Morton-key ranges at `level` covering
    the bbox. Cover cells are computed at `cover_level` (default level-6,
    floored at 0) and widened to their level-`level` descendant
    intervals; adjacent intervals merge, so a rectangular bbox yields a
    short range list regardless of area."""
    if cover_level is None:
        cover_level = max(level - 6, 0)
    cover_level = min(cover_level, level)
    pad = 1e-7   # one fixed-point unit, same guard as the polygon cover
    x0, y0 = lonlat_to_xy(np.asarray([lon_min - pad]),
                          np.asarray([lat_min - pad]), cover_level)
    x1, y1 = lonlat_to_xy(np.asarray([lon_max + pad]),
                          np.asarray([lat_max + pad]), cover_level)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.uint64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.uint64)
    m = (_part1by1(xs)[None, :]
         | (_part1by1(ys)[:, None] << np.uint64(1))).ravel()
    m.sort()
    shift = np.uint64(2 * (level - cover_level))
    starts = (m << shift).astype(np.int64)
    ends = ((m + np.uint64(1)) << shift).astype(np.int64)
    # merge adjacent/contiguous intervals
    keep = np.ones(len(starts), dtype=bool)
    keep[1:] = starts[1:] != ends[:-1]
    out_starts = starts[keep]
    out_ends = ends[np.append(np.nonzero(keep)[0][1:] - 1, len(ends) - 1)]
    return np.stack([out_starts, out_ends], axis=1)


def zrange_scan(refs, mins: np.ndarray, maxs: np.ndarray,
                ranges: np.ndarray, predicate=None):
    """Scan a z-sorted block set for rows inside the given key ranges.

    Prunes blocks whose [min, max] interval misses every range (pure
    manifest arithmetic, no row data), then filters survivors map-side:
    z-range membership via searchsorted, plus an optional exact
    `predicate(batch) -> bool mask` (the range test is a superset of the
    true bbox: cover cells overhang the query edges).

    Returns (dataset, stats) where stats = {"blocks_total", "blocks_scanned"}.
    Returns (None, stats) when every block is pruned."""
    import ray.data as rd

    starts, ends = ranges[:, 0], ranges[:, 1]
    hit = np.zeros(len(refs), dtype=bool)
    for s, e in zip(starts, ends):
        hit |= (mins < e) & (maxs >= s)
    stats = {"blocks_total": int(len(refs)),
             "blocks_scanned": int(hit.sum())}
    kept = [r for r, h in zip(refs, hit) if h]
    if not kept:
        return None, stats

    def f(batch: pa.Table) -> pa.Table:
        z = batch["zkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(starts, z, side="right") - 1
        m = (pos >= 0) & (z < ends[np.clip(pos, 0, len(ends) - 1)])
        if predicate is not None:
            m &= predicate(batch)
        return batch.filter(pa.array(m))

    return rd.from_arrow_refs(kept).map_batches(f, batch_format="pyarrow"), stats


def zranges_for_region(region, level: int,
                       cover_level: int | None = None) -> np.ndarray:
    """Merged z-key ranges covering an extract Region (bbox or polygon).

    Polygons use their envelope for the range cover (a superset — the
    exact banded-PIP kernel runs as the scan predicate on surviving
    blocks, the same two-stage shape as the cell-cover prefilter in
    state/regions.py); bboxes cover exactly."""
    return zranges_for_bbox(*region.envelope(), level,
                            cover_level=cover_level)


def zregion_scan(refs, mins: np.ndarray, maxs: np.ndarray, region,
                 level: int, lon_col: str = "lon", lat_col: str = "lat"):
    """Partition-pruned extract of one Region over a z-sorted block set:
    manifest prune by the region's z-ranges, then the region's own exact
    containment kernel (fixed-point bbox test or banded PIP) filters the
    survivors map-side."""
    def predicate(batch: pa.Table) -> np.ndarray:
        return region.contains(
            batch[lon_col].to_numpy(zero_copy_only=False),
            batch[lat_col].to_numpy(zero_copy_only=False))

    return zrange_scan(refs, mins, maxs, zranges_for_region(region, level),
                       predicate=predicate)


def hilbert_key(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Hilbert-curve key at `level` (int64), vectorized over the whole
    batch — `level` iterations of pure-numpy quadrant rotation (the
    classic xy->d walk; public algorithm, e.g. Hamilton's compact
    Hilbert indices / the Wikipedia reference form). Unlike Morton,
    consecutive keys are always 4-neighbors on the grid, so block key
    ranges have strictly better spatial locality (no z-curve seam
    jumps) — the alternative linearization lakehouse layouts offer."""
    x, y = lonlat_to_xy(lon, lat, level)
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(1) << np.int64(max(level - 1, 0))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant so the sub-curve orientation is canonical
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = (np.where(swap, y_f, x_f).astype(np.int64),
                np.where(swap, x_f, y_f).astype(np.int64))
        s >>= np.int64(1)
    return d


def hilbert_layout(ds, level: int = 12, lon_col: str = "lon",
                   lat_col: str = "lat", hkey_col: str = "hkey"):
    """Append the Hilbert key and globally sort by it — the Hilbert
    twin of zorder_layout (one all-to-all, amortized over every later
    range query)."""
    def tag(batch: pa.Table) -> pa.Table:
        h = hilbert_key(batch[lon_col].to_numpy(zero_copy_only=False),
                        batch[lat_col].to_numpy(zero_copy_only=False),
                        level)
        return batch.append_column(hkey_col, pa.array(h))

    return ds.map_batches(tag, batch_format="pyarrow").sort(hkey_col)


def block_bbox_manifest(sorted_ds, lon_col: str = "lon",
                        lat_col: str = "lat"):
    """Per-block spatial bounding-box manifest (min/max lon/lat) of a
    spatially-sorted Dataset — works for ANY clustering sort (Hilbert,
    Morton, geohash): 32 bytes/block of driver metadata, the same shape
    as Parquet column min/max statistics. Returns
    (refs, lo_lon, hi_lon, lo_lat, hi_lat)."""
    import ray

    @ray.remote(num_cpus=0)
    def mm(tbl: pa.Table):
        if tbl.num_rows == 0 or lon_col not in tbl.schema.names:
            return (1.0, -1.0, 1.0, -1.0)          # empty: lo > hi
        lon = tbl[lon_col].to_numpy(zero_copy_only=False)
        lat = tbl[lat_col].to_numpy(zero_copy_only=False)
        return (float(lon.min()), float(lon.max()),
                float(lat.min()), float(lat.max()))

    refs = sorted_ds.to_arrow_refs()
    vals = ray.get([mm.remote(r) for r in refs])
    a = np.asarray(vals, dtype=np.float64)
    return refs, a[:, 0], a[:, 1], a[:, 2], a[:, 3]


def bbox_manifest_scan(refs, lo_lon, hi_lon, lo_lat, hi_lat,
                       bbox: tuple, predicate=None,
                       lon_col: str = "lon", lat_col: str = "lat"):
    """Partition-pruned bbox scan over a block-bbox manifest: drop every
    block whose bounding box misses the query rectangle (pure manifest
    arithmetic), run the exact filter inside the survivors. Returns
    (dataset, stats) like zrange_scan; (None, stats) when all pruned."""
    import ray.data as rd

    x0, y0, x1, y1 = bbox
    hit = (lo_lon <= x1) & (hi_lon >= x0) & (lo_lat <= y1) & (hi_lat >= y0)
    stats = {"blocks_total": int(len(refs)),
             "blocks_scanned": int(hit.sum())}
    kept = [r for r, h in zip(refs, hit) if h]
    if not kept:
        return None, stats

    def f(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
        if predicate is not None:
            m &= predicate(batch)
        return batch.filter(pa.array(m))

    return (rd.from_arrow_refs(kept).map_batches(f, batch_format="pyarrow"),
            stats)
