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
import pandas as pd
import pyarrow as pa

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
    mosaic_w:int32, mosaic_h:int32). Blobs stay inside the group task; only
    the grouped rows shuffle (keyed by cell — salt hot cells upstream with
    stages.tiles when member counts are skewed)."""
    from ..functions.imagecodec import decode_batch, encode_batch

    def add_cell(batch: pa.Table) -> pa.Table:
        cells = cell_encode(batch[lon_col].to_numpy(zero_copy_only=False),
                            batch[lat_col].to_numpy(zero_copy_only=False),
                            level).view(np.int64)
        return batch.append_column("cell", pa.array(cells))

    keyed = images.map_batches(add_cell, batch_format="pyarrow")

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").head(max_members)
        blobs = pa.array(list(g[bytes_col]), type=pa.large_binary())
        pix, w, h = decode_batch(blobs)
        n = len(g)
        W, H = int(w[0]), int(h[0])
        imgs = pix.reshape(n, H, W, 3)
        ys = np.arange(tile_px) * H // tile_px
        xs = np.arange(tile_px) * W // tile_px
        small = imgs[:, ys][:, :, xs]  # (n, tile_px, tile_px, 3)
        side = int(np.ceil(np.sqrt(n)))
        canvas = np.zeros((side * tile_px, side * tile_px, 3), dtype=np.uint8)
        for i in range(n):
            r, c = divmod(i, side)
            canvas[r * tile_px:(r + 1) * tile_px,
                   c * tile_px:(c + 1) * tile_px] = small[i]
        enc = encode_batch(canvas.reshape(1, -1), np.array(["png"]),
                           side * tile_px, side * tile_px)
        return pd.DataFrame({
            "cell": [int(g["cell"].iloc[0])],
            "n_members": [n],
            "mosaic": [enc[0].as_py()],
            "mosaic_w": [side * tile_px],
            "mosaic_h": [side * tile_px],
        })

    return keyed.groupby("cell").map_groups(assemble, batch_format="pandas")
