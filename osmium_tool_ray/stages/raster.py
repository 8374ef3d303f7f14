"""Raster <-> vector assignment (north-rule graft ops).

  * rasterize_region: vector polygon -> per-cell raster coverage at a cell
    level. Interior cells get coverage 1.0; boundary cells are estimated by
    a deterministic subsample PIP grid (exact kernel on an s x s lattice
    inside the cell) — the vector->raster direction.
  * tile_mosaic: raster->vector-ish assembly: group image rows by cell and
    compose one mosaic image per tile from the decoded member pixels
    (deterministic id-sorted arrangement) — the per-tile grouped assembly
    shape of `osmium export`'s area building
    (/root/reference/src/command_export.cpp:599-604) re-targeted at image
    payloads. Runs as groupby(cell).map_groups with the heavy pixel work
    vectorized inside each group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.cells import cell_bounds, cell_encode
from ..state.regions import Region, region_cover


def rasterize_region(region: Region, level: int, supersample: int = 8) -> pa.Table:
    """-> (cell:int64, coverage:float64) for every cell intersecting the
    region. Deterministic; boundary coverage resolution = 1/supersample^2."""
    interior, boundary = region_cover(region, level)
    cells_out = []
    cov_out = []
    for cset in ([interior] if len(interior) else []):
        cells_out.append(cset.view(np.int64))
        cov_out.append(np.ones(len(cset)))
    if len(boundary):
        lon0, lat0, lon1, lat1 = cell_bounds(boundary)
        s = supersample
        # s x s midpoint lattice per cell, one vectorized PIP call
        fx = (np.arange(s) + 0.5) / s
        glon = lon0[:, None, None] + (lon1 - lon0)[:, None, None] * fx[None, :, None]
        glat = lat0[:, None, None] + (lat1 - lat0)[:, None, None] * fx[None, None, :]
        glon = np.broadcast_to(glon, (len(boundary), s, s)).reshape(-1)
        glat = np.broadcast_to(glat, (len(boundary), s, s)).reshape(-1)
        inside = region.contains(glon, glat).reshape(len(boundary), s * s)
        cov = inside.mean(axis=1)
        keep = cov > 0
        cells_out.append(boundary[keep].view(np.int64))
        cov_out.append(cov[keep])
    if not cells_out:
        return pa.table({"cell": pa.array([], type=pa.int64()),
                         "coverage": pa.array([], type=pa.float64())})
    return pa.table({"cell": pa.array(np.concatenate(cells_out)),
                     "coverage": pa.array(np.concatenate(cov_out))})


def tile_mosaic(images, level: int, tile_px: int = 4, max_members: int = 64,
                lon_col: str = "lon", lat_col: str = "lat",
                id_col: str = "image_id", bytes_col: str = "bytes"):
    """Per-cell mosaic: decode up to `max_members` member images (id-sorted,
    deterministic), downsample each to tile_px x tile_px, arrange them in a
    square grid, re-encode as one png-coded mosaic per tile.

    Returns a Dataset of (cell:int64, n_members:int64, mosaic:binary,
    mosaic_w:int32, mosaic_h:int32).

    Scale shape (blobs NEVER enter a shuffle):
      1. only the narrow (cell, image_id) projection shuffles to pick the
         per-cell winner set (id-sorted head(max_members));
      2. the winner id set — bounded by max_members * 4^level, a
         metadata-class table at mosaic zoom levels — is broadcast and the
         blob side is filtered map-side;
      3. winners are decoded + downsampled map-side to tile_px*tile_px
         thumbnails (3*tile_px^2 bytes each) and only those thumbnails
         shuffle into the per-cell assemble."""
    from ..functions.imagecodec import decode_batch, encode_batch

    def add_cell_narrow(batch: pa.Table) -> pa.Table:
        cells = cell_encode(batch[lon_col].to_numpy(zero_copy_only=False),
                            batch[lat_col].to_numpy(zero_copy_only=False),
                            level).view(np.int64)
        return pa.table({"cell": pa.array(cells), id_col: batch[id_col]})

    narrow = images.select_columns([id_col, lon_col, lat_col]) \
        .map_batches(add_cell_narrow, batch_format="pyarrow")

    def pick_winners(g: pa.Table) -> pa.Table:
        order = np.argsort(_np_obj(g[id_col]), kind="stable")[:max_members]
        return g.take(pa.array(order))

    winners = narrow.groupby("cell").map_groups(pick_winners,
                                                batch_format="pyarrow")
    import ray
    wtbls = [t for t in ray.get(winners.to_arrow_refs()) if t.num_rows]
    wtbl = pa.concat_tables(wtbls) if wtbls else pa.table(
        {"cell": pa.array([], type=pa.int64()),
         id_col: pa.array([], type=pa.string())})
    wref = ray.put(np.sort(_np_obj(wtbl[id_col]).astype(str)))

    def thumb(batch: pa.Table) -> pa.Table:
        wins = ray.get(wref)
        ids = _np_obj(batch[id_col]).astype(str)
        pos = np.searchsorted(wins, ids)
        pos[pos == len(wins)] = max(len(wins) - 1, 0)
        m = wins[pos] == ids if len(wins) else np.zeros(len(ids), dtype=bool)
        batch = batch.filter(pa.array(m))
        if batch.num_rows == 0:
            return pa.table({"cell": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.string()),
                             "thumb": pa.array([], type=pa.binary())})
        pix, w, h = decode_batch(batch[bytes_col])
        n = batch.num_rows
        W, H = int(w[0]), int(h[0])
        imgs = pix.reshape(n, H, W, 3)
        ys = np.arange(tile_px) * H // tile_px
        xs = np.arange(tile_px) * W // tile_px
        small = imgs[:, ys][:, :, xs]  # (n, tile_px, tile_px, 3)
        cells = cell_encode(batch[lon_col].to_numpy(zero_copy_only=False),
                            batch[lat_col].to_numpy(zero_copy_only=False),
                            level).view(np.int64)
        flat = small.reshape(n, -1)
        return pa.table({"cell": pa.array(cells), id_col: batch[id_col],
                         "thumb": pa.array([flat[i].tobytes() for i in range(n)],
                                           type=pa.binary())})

    thumbs = images.map_batches(thumb, batch_format="pyarrow")

    def assemble(g: pa.Table) -> pa.Table:
        order = np.argsort(_np_obj(g[id_col]), kind="stable")
        g = g.take(pa.array(order))
        n = g.num_rows
        small = np.stack([np.frombuffer(b, dtype=np.uint8).reshape(
            tile_px, tile_px, 3) for b in g["thumb"].to_pylist()])
        side = int(np.ceil(np.sqrt(n)))
        canvas = np.zeros((side * tile_px, side * tile_px, 3), dtype=np.uint8)
        for i in range(n):
            r, c = divmod(i, side)
            canvas[r * tile_px:(r + 1) * tile_px,
                   c * tile_px:(c + 1) * tile_px] = small[i]
        enc = encode_batch(canvas.reshape(1, -1), np.array(["png"]),
                           side * tile_px, side * tile_px)
        return pa.table({
            "cell": pa.array([int(g["cell"][0].as_py())], type=pa.int64()),
            "n_members": pa.array([n], type=pa.int64()),
            "mosaic": pa.array([enc[0].as_py()], type=pa.binary()),
            "mosaic_w": pa.array([side * tile_px], type=pa.int32()),
            "mosaic_h": pa.array([side * tile_px], type=pa.int32()),
        })

    return thumbs.groupby("cell").map_groups(assemble, batch_format="pyarrow")


def _np_obj(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=object)


def smooth_cell_counts(points, level: int, lon_col: str = "lon",
                       lat_col: str = "lat"):
    """3x3 box smoothing over the sparse point-density raster — the
    heatmap/KDE-lite pass GIS pipelines run after rasterizing counts
    (raster side of the raster<->vector pair; rasterize_region above is
    the vector->raster direction). smoothed(x, y) = SUM of raw counts
    over the 3x3 neighborhood; cells outside the grid are clipped, and
    empty cells that receive neighbor mass appear in the output (the
    sparse-explode semantics, exactly reproducible in SQL).

    Scale shape: per-batch np.unique count pre-agg, the x9 neighbor
    explode runs in the SAME map task on the pre-agged sparse cells,
    then ONE native Sum groupby over packed int64 cell keys — never a
    dense raster materialization. Returns (cell_x, cell_y,
    smoothed:int64)."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(level)

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(x, 0, n - 1, out=x)
        np.clip(y, 0, n - 1, out=y)
        key = (x << np.int64(32)) | y
        uk, cnt = np.unique(key, return_counts=True)
        ux, uy = uk >> np.int64(32), uk & np.int64(0xFFFFFFFF)
        # x9 neighbor explode on the pre-agged sparse cells
        off = np.array([-1, 0, 1], dtype=np.int64)
        u = len(uk)
        nx = np.broadcast_to(ux[:, None, None] + off[None, :, None],
                             (u, 3, 3)).reshape(-1)
        ny = np.broadcast_to(uy[:, None, None] + off[None, None, :],
                             (u, 3, 3)).reshape(-1)
        nc = np.repeat(cnt.astype(np.int64), 9)
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        nkey = (nx[ok] << np.int64(32)) | ny[ok]
        # second unique: merge the 9 shifted copies within the batch
        fk, inv = np.unique(nkey, return_inverse=True)
        fc = np.bincount(inv, weights=nc[ok]).astype(np.int64)
        return pa.table({"_k": pa.array(fk), "n": pa.array(fc)})

    agg = points.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("n", alias_name="smoothed"))

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell_x": pa.array(k >> np.int64(32)),
            "cell_y": pa.array(k & np.int64(0xFFFFFFFF)),
            "smoothed": batch["smoothed"].cast(pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def _exact_cell_counts(points, level: int, lon_col: str, lat_col: str):
    """Exact per-cell point counts keyed by packed (x<<32|y) int64 —
    per-batch np.unique pre-agg then ONE native Sum groupby (the
    smooth_cell_counts head, shared by the spatial-statistics ops
    below). Returns a Dataset of (_k:int64, x:int64)."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(level)

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(x, 0, n - 1, out=x)
        np.clip(y, 0, n - 1, out=y)
        key = (x << np.int64(32)) | y
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"_k": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    return points.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("n", alias_name="x"))


def _neighbor_fold(cells, level: int, include_self: bool):
    """Shared queen-adjacency fold: every in-set cell emits its own count
    to each neighbor in the 3x3 window (8-neighborhood, optionally
    including itself), plus a self-marker row carrying its own count;
    ONE Sum groupby then yields, per cell, its exact count `x`, the
    neighborhood count sum `wsum` and the number of in-set contributing
    neighbors `wdeg`. Runs on CELL-scale data (after _exact_cell_counts'
    point-scale reduction), so the x9 explode is cheap. Cells with
    x == 0 (pure receivers outside the set) are dropped — the sparse
    in-set universe both spatial statistics are defined over."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(level)

    def explode(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        x = batch["x"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cx, cy = k >> np.int64(32), k & np.int64(0xFFFFFFFF)
        u = len(k)
        off = np.array([-1, 0, 1], dtype=np.int64)
        nx = np.broadcast_to(cx[:, None, None] + off[None, :, None],
                             (u, 3, 3)).reshape(-1)
        ny = np.broadcast_to(cy[:, None, None] + off[None, None, :],
                             (u, 3, 3)).reshape(-1)
        nc = np.repeat(x, 9)
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        if not include_self:
            self_pos = np.zeros((u, 3, 3), dtype=bool)
            self_pos[:, 1, 1] = True
            ok &= ~self_pos.reshape(-1)
        nkey = (nx[ok] << np.int64(32)) | ny[ok]
        ncnt = nc[ok]
        zs = np.zeros(len(nkey), dtype=np.int64)
        zc = np.zeros(u, dtype=np.int64)
        return pa.table({
            "_k": pa.array(np.concatenate([k, nkey])),
            "sx": pa.array(np.concatenate([x, zs])),
            "wx": pa.array(np.concatenate([zc, ncnt])),
            "wd": pa.array(np.concatenate(
                [zc, np.ones(len(nkey), dtype=np.int64)]))})

    folded = cells.map_batches(explode, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("sx", alias_name="x"),
                                 Sum("wx", alias_name="wsum"),
                                 Sum("wd", alias_name="wdeg"))
    return folded.filter(expr="x > 0")


def _int_scalar_fold(ds, exprs):
    """Fold integer scalar aggregates to the driver exactly: per-batch
    partial sums (one short row per block) -> take_all -> Python-int
    fold (arbitrary precision, so products in the callers never wrap).
    `exprs` maps output name -> fn(batch)->int."""
    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({k: pa.array([int(fn(batch))], type=pa.int64())
                         for k, fn in exprs.items()})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return {k: sum(int(r[k]) for r in rows) for k in exprs}


def moran_i(points, level: int, lon_col: str = "lon",
            lat_col: str = "lat"):
    """Global Moran's I spatial autocorrelation of the point-density
    raster under queen (8-neighbor) adjacency over the in-set cells —
    THE textbook clustered/dispersed statistic GIS suites report for a
    density grid (the scalar complement of hotspot_tiles' per-cell
    rule; ESDA's measure of whether dense image tiles border dense
    tiles). I = (N/W) * sum_ij w_ij (x_i-m)(x_j-m) / sum_i (x_i-m)^2.

    Exactness: every aggregate (N, W, S1=sum x, S2=sum x^2,
    C=sum_ij x_i x_j, D=sum_i deg_i x_i) is integer; the identity
      I = (C*N^2 - 2*S1*D*N + W*S1^2) / (W * (N*S2 - S1^2))
    defers ALL floating point to one final double division, so the SQL
    twin (HUGEINT arithmetic, one CAST AS DOUBLE quotient) matches
    bit-for-bit. The driver fold is Python-int (arbitrary precision).

    Scale shape: point-scale work is ONE Sum groupby (exact cell
    counts); the x8 neighbor explode + second Sum groupby run on
    CELL-scale data; the final fold moves one short row per block.
    Returns one row (n_cells, w_pairs, moran_i:float64)."""
    cells = _exact_cell_counts(points, level, lon_col, lat_col)
    folded = _neighbor_fold(cells, level, include_self=False)
    s = _int_scalar_fold(folded, {
        "n": lambda b: b.num_rows,
        "s1": lambda b: pc.sum(b["x"]).as_py() or 0,
        "s2": lambda b: pc.sum(pc.multiply(b["x"], b["x"])).as_py() or 0,
        "c": lambda b: pc.sum(pc.multiply(b["x"], b["wsum"])).as_py() or 0,
        "d": lambda b: pc.sum(pc.multiply(b["x"], b["wdeg"])).as_py() or 0,
        "w": lambda b: pc.sum(b["wdeg"]).as_py() or 0,
    })
    n, s1, s2, c, d, w = (s[k] for k in ["n", "s1", "s2", "c", "d", "w"])
    num = c * n * n - 2 * s1 * d * n + w * s1 * s1
    den = w * (n * s2 - s1 * s1)
    val = float(num) / float(den) if den else float("nan")
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "n_cells": pa.array([n], type=pa.int64()),
        "w_pairs": pa.array([w], type=pa.int64()),
        "moran_i": pa.array([val], type=pa.float64())}))


def getis_gi_cells(points, level: int, lon_col: str = "lon",
                   lat_col: str = "lat"):
    """Getis-Ord Gi* hotspot z-score per cell (star variant: the 3x3
    window INCLUDES the cell itself) over the in-set point-density
    raster — the per-cell statistical-significance upgrade of
    hotspot_tiles' fixed mean+z*sd rule, the statistic behind
    "hot spot analysis" layers in GIS dashboards.

      Gi*_i = (wsum_i - m*wdeg_i)
              / (s * sqrt((N*wdeg_i - wdeg_i^2) / (N-1)))
      with m = S1/N, s = sqrt(S2/N - m^2), all of N/S1/S2/wsum/wdeg
      exact integers.

    Exactness: only correctly-rounded IEEE ops (divide, multiply,
    subtract, sqrt) applied in a fixed expression tree mirrored
    literally by the SQL twin — the bm25/cosine precedent; no
    transcendentals. Scale shape: identical to moran_i (ONE point-scale
    Sum groupby, cell-scale x9 explode + Sum groupby, 3-integer moment
    fold, then a shuffle-free vectorized map). Returns (cell_x, cell_y,
    n_images:int64, gi_star:float64) for every in-set cell."""
    import math

    cells = _exact_cell_counts(points, level, lon_col, lat_col)
    moments = _int_scalar_fold(cells, {
        "n": lambda b: b.num_rows,
        "s1": lambda b: pc.sum(b["x"]).as_py() or 0,
        "s2": lambda b: pc.sum(pc.multiply(b["x"], b["x"])).as_py() or 0,
    })
    n, s1, s2 = moments["n"], moments["s1"], moments["s2"]
    m = float(s1) / float(n)
    sdev = math.sqrt(float(s2) / float(n) - m * m)
    folded = _neighbor_fold(cells, level, include_self=True)

    def finish(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        x = batch["x"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wsum = batch["wsum"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        wdeg = batch["wdeg"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        num = wsum - m * wdeg
        den = sdev * np.sqrt((n * wdeg - wdeg * wdeg) / float(n - 1))
        return pa.table({
            "cell_x": pa.array(k >> np.int64(32)),
            "cell_y": pa.array(k & np.int64(0xFFFFFFFF)),
            "n_images": pa.array(x),
            "gi_star": pa.array(num / den, type=pa.float64())})

    return folded.map_batches(finish, batch_format="pyarrow")


def local_moran_cells(points, level: int, lon_col: str = "lon",
                      lat_col: str = "lat"):
    """Local Moran's I (LISA, Anselin 1995) per cell — the local
    decomposition of moran_i above: which cells sit in high-high /
    low-low clusters vs high-low outliers.

        I_i = (x_i - m) * (wsum_i - m * wdeg_i) / s2m
        with m = S1/N and s2m = (S2 - S1^2/N) / N  (the mean squared
        deviation), all of N/S1/S2/wsum/wdeg exact integers.

    Exactness: the numerator expands to the integer
        (N x_i - S1) * (N wsum_i - S1 wdeg_i)
    over N^2, so the kernel computes num_i exactly in int64 and spends
    floats only on the fixed tree num / N^2 / s2m mirrored literally in
    SQL — no subtraction of rounded doubles. Scale shape identical to
    moran_i (the x8 neighbor fold, excluding self). Returns (cell_x,
    cell_y, n_images:int64, local_i:float64) for in-set cells."""
    cells = _exact_cell_counts(points, level, lon_col, lat_col)
    moments = _int_scalar_fold(cells, {
        "n": lambda b: b.num_rows,
        "s1": lambda b: pc.sum(b["x"]).as_py() or 0,
        "s2": lambda b: pc.sum(pc.multiply(b["x"], b["x"])).as_py() or 0,
    })
    n, s1, s2 = moments["n"], moments["s1"], moments["s2"]
    s2m = (float(s2) - float(s1 * s1) / float(n)) / float(n)
    n2 = float(n * n)
    folded = _neighbor_fold(cells, level, include_self=False)

    def finish(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        x = batch["x"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wsum = batch["wsum"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        wdeg = batch["wdeg"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        num = (n * x - s1) * (n * wsum - s1 * wdeg)
        li = num / n2 / s2m
        return pa.table({
            "cell_x": pa.array(k >> np.int64(32)),
            "cell_y": pa.array(k & np.int64(0xFFFFFFFF)),
            "n_images": pa.array(x),
            "local_i": pa.array(li, type=pa.float64())})

    return folded.map_batches(finish, batch_format="pyarrow")


def join_count_stats(points, level: int, hot_threshold: int,
                     lon_col: str = "lon", lat_col: str = "lat"):
    """Join-count statistics (Cliff & Ord 1981) for the binary raster
    "hot" = cell count >= hot_threshold under queen adjacency: how many
    hot-hot / hot-cold / cold-cold neighboring cell pairs the in-set
    grid contains — the categorical counterpart of moran_i (clustered
    hot cells => BB high, checkerboard => BW high). ALL-integer (no
    floats anywhere), so the SQL twin is trivially exact.

    Scale shape: the moran_i two-shuffle shape with the hot FLAG
    folded alongside the count; undirected pair counts halve the
    ordered sums (always even). Returns one row (n_hot, n_cold, bb,
    bw, ww, w_pairs — undirected)."""
    from ray.data.aggregate import Sum

    cells = _exact_cell_counts(points, level, lon_col, lat_col)
    n = np.int64(1) << np.int64(level)
    thr = np.int64(hot_threshold)

    def explode(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        x = batch["x"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hot = (x >= thr).astype(np.int64)
        cx, cy = k >> np.int64(32), k & np.int64(0xFFFFFFFF)
        u = len(k)
        off = np.array([-1, 0, 1], dtype=np.int64)
        nx = np.broadcast_to(cx[:, None, None] + off[None, :, None],
                             (u, 3, 3)).reshape(-1)
        ny = np.broadcast_to(cy[:, None, None] + off[None, None, :],
                             (u, 3, 3)).reshape(-1)
        self_pos = np.zeros((u, 3, 3), dtype=bool)
        self_pos[:, 1, 1] = True
        ok = ((nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
              & ~self_pos.reshape(-1))
        nkey = (nx[ok] << np.int64(32)) | ny[ok]
        nhot = np.repeat(hot, 9)[ok]
        zs = np.zeros(len(nkey), dtype=np.int64)
        zc = np.zeros(u, dtype=np.int64)
        return pa.table({
            "_k": pa.array(np.concatenate([k, nkey])),
            "shot": pa.array(np.concatenate([hot + 1, zs])),  # 1=cold,2=hot
            "nhot": pa.array(np.concatenate([zc, nhot])),
            "nd": pa.array(np.concatenate(
                [zc, np.ones(len(nkey), dtype=np.int64)]))})

    folded = cells.map_batches(explode, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("shot", alias_name="shot"),
                                 Sum("nhot", alias_name="nhot"),
                                 Sum("nd", alias_name="nd")) \
        .filter(expr="shot > 0")
    s = _int_scalar_fold(folded, {
        "n_hot": lambda b: pc.sum(pc.cast(pc.equal(b["shot"], 2),
                                          pa.int64())).as_py() or 0,
        "n_cold": lambda b: pc.sum(pc.cast(pc.equal(b["shot"], 1),
                                           pa.int64())).as_py() or 0,
        # ordered hot->hot / cold->any-hot / total arrivals
        "bb2": lambda b: pc.sum(pc.multiply(
            pc.cast(pc.equal(b["shot"], 2), pa.int64()),
            b["nhot"])).as_py() or 0,
        "cold_hot": lambda b: pc.sum(pc.multiply(
            pc.cast(pc.equal(b["shot"], 1), pa.int64()),
            b["nhot"])).as_py() or 0,
        "hot_deg": lambda b: pc.sum(pc.multiply(
            pc.cast(pc.equal(b["shot"], 2), pa.int64()),
            b["nd"])).as_py() or 0,
        "cold_deg": lambda b: pc.sum(pc.multiply(
            pc.cast(pc.equal(b["shot"], 1), pa.int64()),
            b["nd"])).as_py() or 0,
    })
    # ordered arrivals: bb2 = hot->hot (2x undirected BB); hot cells'
    # non-hot arrivals (hot_deg - bb2) are cold->hot, and cold cells'
    # hot arrivals (cold_hot) are hot->cold — together 2x undirected BW
    bb = s["bb2"] // 2
    bw = ((s["hot_deg"] - s["bb2"]) + s["cold_hot"]) // 2
    ww = (s["cold_deg"] - s["cold_hot"]) // 2
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "n_hot": pa.array([s["n_hot"]], type=pa.int64()),
        "n_cold": pa.array([s["n_cold"]], type=pa.int64()),
        "bb": pa.array([bb], type=pa.int64()),
        "bw": pa.array([bw], type=pa.int64()),
        "ww": pa.array([ww], type=pa.int64()),
        "w_pairs": pa.array([bb + bw + ww], type=pa.int64())}))


def semivariogram_cells(points, level: int, max_lag: int = 3,
                        lon_col: str = "lon", lat_col: str = "lat"):
    """Empirical semivariogram of the cell-count surface at Chebyshev
    lags 1..max_lag — kriging's first artifact (Matheron 1963):
    gamma(h) = sum over pairs at lag h of (x_i - x_j)^2 / (2 N(h)).
    Spatially-correlated data shows gamma rising with lag toward a
    sill; noise is flat.

    Exactness: per lag, the ordered-pair identity
    sum (x_i-x_j)^2 = 2 * (D2_h - C_h) with D2_h = sum deg_i x_i^2 and
    C_h = sum x_i nbrsum_i keeps everything integer; gamma =
    (D2_h - C_h) / W_h spends ONE double division per lag (the SQL twin
    computes SUM(diff^2)//2 / COUNT — the same exact integer ratio).
    Scale shape: ONE cell-scale explode over the (2L+1)^2-1 ring
    offsets + ONE Sum groupby on the packed (cell, lag) key, then a
    per-lag Python-int fold of one short row per block. Level must be
    <= 20 (packed key is x:24 | y:24 | lag:4... actually x<<28|y<<4|lag
    with x, y < 2^24). Returns (lag:int64, w_pairs:int64,
    gamma:float64), one row per non-empty lag."""
    from ray.data.aggregate import Sum

    if level > 20:
        raise ValueError("semivariogram_cells packs (x, y, lag) into "
                         "int64; level must be <= 20")
    cells = _exact_cell_counts(points, level, lon_col, lat_col)
    n = np.int64(1) << np.int64(level)
    L = int(max_lag)

    offs = []
    for dx in range(-L, L + 1):
        for dy in range(-L, L + 1):
            lag = max(abs(dx), abs(dy))
            if lag >= 1:
                offs.append((dx, dy, lag))
    odx = np.array([o[0] for o in offs], dtype=np.int64)
    ody = np.array([o[1] for o in offs], dtype=np.int64)
    olag = np.array([o[2] for o in offs], dtype=np.int64)
    m = len(offs)

    def explode(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        x = batch["x"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cx, cy = k >> np.int64(32), k & np.int64(0xFFFFFFFF)
        u = len(k)
        nx = (cx[:, None] + odx[None, :]).reshape(-1)
        ny = (cy[:, None] + ody[None, :]).reshape(-1)
        nl = np.broadcast_to(olag[None, :], (u, m)).reshape(-1)
        nc = np.repeat(x, m)
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        nkey = (((nx[ok] << np.int64(24)) | ny[ok]) << np.int64(4)) \
            | nl[ok]
        # self rows: one per (cell, lag) so the receiver's own count
        # rides the same groupby
        skey = (((cx[:, None] << np.int64(24)) | cy[:, None])
                << np.int64(4)) + np.arange(1, L + 1,
                                            dtype=np.int64)[None, :]
        skey = skey.reshape(-1)
        sx = np.repeat(x, L)
        zn = np.zeros(len(nkey), dtype=np.int64)
        zs = np.zeros(len(skey), dtype=np.int64)
        return pa.table({
            "_kl": pa.array(np.concatenate([skey, nkey])),
            "sx": pa.array(np.concatenate([sx, zn])),
            "nsum": pa.array(np.concatenate([zs, nc[ok]])),
            "nd": pa.array(np.concatenate(
                [zs, np.ones(len(nkey), dtype=np.int64)]))})

    folded = cells.map_batches(explode, batch_format="pyarrow") \
        .groupby("_kl").aggregate(Sum("sx", alias_name="x"),
                                  Sum("nsum", alias_name="nsum"),
                                  Sum("nd", alias_name="nd")) \
        .filter(expr="x > 0")

    def partial(batch: pa.Table) -> pa.Table:
        kl = batch["_kl"].to_numpy(zero_copy_only=False)
        x = batch["x"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ns = batch["nsum"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        nd = batch["nd"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lag = (kl & np.int64(0xF)).astype(np.int64)
        rows = {"lag": [], "c": [], "d2": [], "w": []}
        for lg in np.unique(lag):
            mk = lag == lg
            rows["lag"].append(int(lg))
            rows["c"].append(int(np.sum(x[mk] * ns[mk])))
            rows["d2"].append(int(np.sum(nd[mk] * x[mk] * x[mk])))
            rows["w"].append(int(np.sum(nd[mk])))
        return pa.table({k: pa.array(v, type=pa.int64())
                         for k, v in rows.items()})

    parts = folded.map_batches(partial, batch_format="pyarrow") \
        .take_all()
    agg: dict = {}
    for r in parts:
        a = agg.setdefault(int(r["lag"]), [0, 0, 0])
        a[0] += int(r["c"])
        a[1] += int(r["d2"])
        a[2] += int(r["w"])
    lags = sorted(lg for lg, v in agg.items() if v[2])
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "lag": pa.array(lags, type=pa.int64()),
        "w_pairs": pa.array([agg[lg][2] for lg in lags],
                            type=pa.int64()),
        "gamma": pa.array([float(agg[lg][1] - agg[lg][0])
                           / float(agg[lg][2]) for lg in lags],
                          type=pa.float64())}))


def gaussian_smooth_cells(points, level: int, lon_col: str = "lon",
                          lat_col: str = "lat"):
    """5x5 binomial (Gaussian-approximating) smoothing over the sparse
    point-density raster: separable [1,4,6,4,1] kernel, so the weight
    of offset (dx, dy) is w[dx+2]*w[dy+2] (sum 256) — the standard
    integer Gaussian blur of image pipelines applied to the density
    raster, exact in int64 end to end (smooth_cell_counts' box filter
    is the 3x3 uniform cousin). Sparse-explode semantics: clipped at
    the grid edge, empty cells receiving mass appear in the output.

    Scale shape identical to smooth_cell_counts: per-batch np.unique
    pre-agg, x25 weighted explode in the same map task, ONE packed-key
    Sum groupby — never a dense raster. Returns (cell_x, cell_y,
    smoothed:int64)."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(level)
    w = np.array([1, 4, 6, 4, 1], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(x, 0, n - 1, out=x)
        np.clip(y, 0, n - 1, out=y)
        key = (x << np.int64(32)) | y
        uk, cnt = np.unique(key, return_counts=True)
        ux, uy = uk >> np.int64(32), uk & np.int64(0xFFFFFFFF)
        off = np.arange(-2, 3, dtype=np.int64)
        u = len(uk)
        nx = np.broadcast_to(ux[:, None, None] + off[None, :, None],
                             (u, 5, 5)).reshape(-1)
        ny = np.broadcast_to(uy[:, None, None] + off[None, None, :],
                             (u, 5, 5)).reshape(-1)
        wgt = np.broadcast_to((w[:, None] * w[None, :])[None, :, :],
                              (u, 5, 5)).reshape(-1)
        nc = np.repeat(cnt.astype(np.int64), 25) * wgt
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        nkey = (nx[ok] << np.int64(32)) | ny[ok]
        fk, inv = np.unique(nkey, return_inverse=True)
        fc = np.bincount(inv, weights=nc[ok]).astype(np.int64)
        return pa.table({"_k": pa.array(fk), "n": pa.array(fc)})

    agg = points.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("n", alias_name="smoothed"))

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        return pa.table({"cell_x": pa.array(k >> np.int64(32)),
                         "cell_y": pa.array(k & np.int64(0xFFFFFFFF)),
                         "smoothed": batch["smoothed"].cast(pa.int64())})

    return agg.map_batches(unpack, batch_format="pyarrow")


def slope_cells(points, level: int, lon_col: str = "lon",
                lat_col: str = "lat"):
    """Central-difference gradient (slope/aspect components) of the
    sparse point-density raster — the focal terrain operator of raster
    GIS (slope from a DEM) applied to the density surface: for every
    OCCUPIED cell, ddx = n(x+1,y) - n(x-1,y), ddy = n(x,y+1) - n(x,y-1)
    (missing / out-of-grid neighbors count 0) and the squared gradient
    magnitude — exact int64 end to end. Reference relative: export's
    per-tile layer derivations (man/osmium-export.md) over extract's
    grid.

    Scale shape (the gaussian_smooth_cells discipline): per-batch
    np.unique pre-agg, x5 channel explode IN the same map task (own
    cell carries the occupancy count; +-x / +-y neighbors carry signed
    difference contributions), ONE packed-key multi-Sum groupby — never
    a dense raster, never a neighbor join. Returns
    (cell_x, cell_y, n:int64, ddx:int64, ddy:int64, grad2:int64)."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(level)

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(x, 0, n - 1, out=x)
        np.clip(y, 0, n - 1, out=y)
        key = (x << np.int64(32)) | y
        uk, cnt = np.unique(key, return_counts=True)
        ux, uy = uk >> np.int64(32), uk & np.int64(0xFFFFFFFF)
        c = cnt.astype(np.int64)
        z = np.zeros_like(c)
        # channels: (dx, dy, occ, ddx, ddy) — a cell's count feeds the
        # ddx of its x-1 / x+1 neighbors with sign, ddy likewise
        parts = [
            (ux, uy, c, z, z),            # own cell: occupancy
            (ux - 1, uy, z, c, z),        # n(x+1) term of ddx at x-1... 
            (ux + 1, uy, z, -c, z),
            (ux, uy - 1, z, z, c),
            (ux, uy + 1, z, z, -c),
        ]
        ax = np.concatenate([p[0] for p in parts])
        ay = np.concatenate([p[1] for p in parts])
        ao = np.concatenate([p[2] for p in parts])
        adx = np.concatenate([p[3] for p in parts])
        ady = np.concatenate([p[4] for p in parts])
        ok = (ax >= 0) & (ax < n) & (ay >= 0) & (ay < n)
        nkey = (ax[ok] << np.int64(32)) | ay[ok]
        fk, inv = np.unique(nkey, return_inverse=True)
        return pa.table({
            "_k": pa.array(fk),
            "occ": pa.array(np.bincount(inv, weights=ao[ok])
                            .astype(np.int64)),
            "ddx": pa.array(np.bincount(inv, weights=adx[ok])
                            .astype(np.int64)),
            "ddy": pa.array(np.bincount(inv, weights=ady[ok])
                            .astype(np.int64))})

    agg = points.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("occ", alias_name="n"),
                                 Sum("ddx", alias_name="ddx"),
                                 Sum("ddy", alias_name="ddy"))

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        occ = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = batch["ddx"].to_numpy(zero_copy_only=False).astype(np.int64)
        dy = batch["ddy"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = occ > 0                      # gradient only at occupied cells
        return pa.table({
            "cell_x": pa.array((k >> np.int64(32))[keep]),
            "cell_y": pa.array((k & np.int64(0xFFFFFFFF))[keep]),
            "n": pa.array(occ[keep]),
            "ddx": pa.array(dx[keep]),
            "ddy": pa.array(dy[keep]),
            "grad2": pa.array(dx[keep] * dx[keep] + dy[keep] * dy[keep])})

    return agg.map_batches(unpack, batch_format="pyarrow")


def coverage_morphology(points, level: int, lon_col: str = "lon",
                        lat_col: str = "lat"):
    """Binary morphology over the occupancy raster: the DILATION
    (8-neighborhood) of the occupied-cell set with per-cell flags
    covered (cell itself occupied) and eroded (cell AND all 8
    neighbors occupied — the morphological EROSION; border cells are
    never eroded since off-grid neighbors are unoccupied). The
    dilate/erode pair is the standard raster cleanup step (gap
    bridging / speckle removal) downstream of rasterize_region.

    Scale shape: ONE count fold collapses points to the sparse
    occupied-cell set (grid-bounded), then a x9 explode + ONE Sum fold
    counts each cell's occupied neighborhood — two grid-bounded
    shuffles, no dense raster, no self-join. Returns
    (cell_x, cell_y, covered:int64, eroded:int64) over the dilated
    set clipped to the grid."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(level)

    def count_partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(x, 0, n - 1, out=x)
        np.clip(y, 0, n - 1, out=y)
        key = (x << np.int64(32)) | y
        uk = np.unique(key)
        return pa.table({"_k": pa.array(uk),
                         "one": pa.array(np.ones(len(uk), np.int64))})

    occupied = points.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("one", alias_name="nb"))

    def explode(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        ux, uy = k >> np.int64(32), k & np.int64(0xFFFFFFFF)
        off = np.arange(-1, 2, dtype=np.int64)
        u = len(k)
        nx = np.broadcast_to(ux[:, None, None] + off[None, :, None],
                             (u, 3, 3)).reshape(-1)
        ny = np.broadcast_to(uy[:, None, None] + off[None, None, :],
                             (u, 3, 3)).reshape(-1)
        occ = np.zeros((u, 3, 3), dtype=np.int64)
        occ[:, 1, 1] = 1                      # offset (0,0): the cell itself
        occ = occ.reshape(-1)
        ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
        return pa.table({"_k": pa.array((nx[ok] << np.int64(32)) | ny[ok]),
                         "one": pa.array(np.ones(int(ok.sum()), np.int64)),
                         "occ": pa.array(occ[ok])})

    folded = occupied.map_batches(explode, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("one", alias_name="nocc"),
                                 Sum("occ", alias_name="covered"))

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        nocc = batch["nocc"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cov = batch["covered"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "cell_x": pa.array(k >> np.int64(32)),
            "cell_y": pa.array(k & np.int64(0xFFFFFFFF)),
            "covered": pa.array(cov),
            "eroded": pa.array((nocc == 9).astype(np.int64))})

    return folded.map_batches(unpack, batch_format="pyarrow")


def flow_direction_cells(points, level: int, lon_col: str = "lon",
                         lat_col: str = "lat"):
    """D8 flow direction over the point-density raster — the hydrology
    focal operator (O'Callaghan & Mark 1984) on the density surface:
    every OCCUPIED cell points at its strictly-lowest 8-neighbor
    (missing / out-of-grid neighbors count 0; ties break to the
    smallest direction index dir = (dj+1)*3 + (di+1), center 4
    excluded; no strictly lower neighbor -> -1, a pit/flat).

    Scale shape (the slope_cells discipline): per-batch np.unique
    pre-agg, x9 channel explode IN the map task (own count + each
    neighbor's count routed to the center's direction channel), ONE
    packed-key multi-Sum groupby, vectorized argmin at the end — never
    a dense raster, never a neighbor join. Returns (cell_x, cell_y,
    n:int64, flow_dir:int64, min_neighbor_n:int64)."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(level)
    offs = [(di, dj) for dj in (-1, 0, 1) for di in (-1, 0, 1)
            if not (di == 0 and dj == 0)]
    chans = [f"c{(dj + 1) * 3 + (di + 1)}" for di, dj in offs]

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(x, 0, n - 1, out=x)
        np.clip(y, 0, n - 1, out=y)
        key = (x << np.int64(32)) | y
        uk, cnt = np.unique(key, return_counts=True)
        ux, uy = uk >> np.int64(32), uk & np.int64(0xFFFFFFFF)
        c = cnt.astype(np.int64)
        z = np.zeros_like(c)
        ax, ay = [ux], [uy]
        cols = {"own": [c]}
        for ch in chans:
            cols[ch] = [z]
        # a cell with count c is the (di, dj) neighbor of center
        # (x - di, y - dj): route c into that center's channel
        for (di, dj), ch in zip(offs, chans):
            ax.append(ux - di)
            ay.append(uy - dj)
            for ch2 in chans:
                cols[ch2].append(c if ch2 == ch else z)
            cols["own"].append(z)
        AX = np.concatenate(ax)
        AY = np.concatenate(ay)
        ok = (AX >= 0) & (AX < n) & (AY >= 0) & (AY < n)
        nkey = (AX[ok] << np.int64(32)) | AY[ok]
        fk, inv = np.unique(nkey, return_inverse=True)
        out = {"cell": pa.array(fk)}
        for name, parts in cols.items():
            v = np.concatenate(parts)[ok]
            out[name] = pa.array(np.bincount(inv, weights=v,
                                             minlength=len(fk))
                                 .astype(np.int64))
        return pa.table(out)

    agg = points.map_batches(partial, batch_format="pyarrow") \
        .groupby("cell").aggregate(
            Sum("own", alias_name="own"),
            *[Sum(ch, alias_name=ch) for ch in chans])

    dir_ids = np.asarray([(dj + 1) * 3 + (di + 1) for di, dj in offs],
                         dtype=np.int64)
    order = np.argsort(dir_ids)          # evaluate in ascending dir id

    def fin(batch: pa.Table) -> pa.Table:
        own = batch["own"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = own > 0                   # only occupied centers
        cell = batch["cell"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[keep]
        nb = np.stack([batch[chans[i]].cast(pa.int64())
                       .to_numpy(zero_copy_only=False)[keep]
                       for i in order], axis=1)
        own = own[keep]
        amin = nb.argmin(axis=1)         # first (smallest dir id) min
        mn = nb[np.arange(len(nb)), amin]
        flow = np.where(mn < own, dir_ids[order][amin], -1)
        return pa.table({
            "cell_x": pa.array(cell >> np.int64(32)),
            "cell_y": pa.array(cell & np.int64(0xFFFFFFFF)),
            "n": pa.array(own),
            "flow_dir": pa.array(flow.astype(np.int64)),
            "min_neighbor_n": pa.array(mn)})

    return agg.map_batches(fin, batch_format="pyarrow")
