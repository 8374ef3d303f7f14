"""Spatial joins beyond point-in-polygon — rectangle-intersection join
and nearest-site assignment. The reference's extract command is a
point-vs-region join (/root/reference/src/extract/extract_bbox.cpp:30-43
tests point containment per object); these stages generalize the same
grid-prefilter idea to rect-vs-rect intersection and to argmin-distance
assignment.

Scale shapes:
  * bbox_join: the classic grid spatial join — each rectangle explodes
    map-side into the cells it covers (narrow (cell, id, x0, y0, x1, y1)
    projection), then ONE hash(cell)%buckets shuffle; inside a bucket
    candidate pairs form per cell fully vectorized (repeat/tile with
    cumsum offsets), and a pair is EMITTED ONLY in the cell containing
    the intersection's min corner — every intersecting pair shares that
    cell, so output pairs are distinct BY CONSTRUCTION and no pair-dedup
    shuffle runs (the same owner-rule trick phash_neardup uses for band
    collisions, stages/dedup.py).
  * nearest_site: the small site table is broadcast ONCE via ray.put as
    packed numpy arrays; every map task computes the full (batch x K)
    squared-distance matrix and an argmin — no shuffle at all. Exact
    integer distances, ties break to the lowest site id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _explode_cells(ids, x0, y0, x1, y1, cell: int):
    """Explode each rect into the grid cells it covers. Returns
    (row_idx, cx, cy) — vectorized with cumsum offsets, no Python loop."""
    cx0, cx1 = x0 // cell, x1 // cell
    cy0, cy1 = y0 // cell, y1 // cell
    nx = (cx1 - cx0 + 1).astype(np.int64)
    ny = (cy1 - cy0 + 1).astype(np.int64)
    cnt = nx * ny
    tot = int(cnt.sum())
    row = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
    # within-rect running index 0..cnt-1
    ends = np.cumsum(cnt)
    local = np.arange(tot, dtype=np.int64) - np.repeat(ends - cnt, cnt)
    nyr = np.repeat(ny, cnt)
    cx = np.repeat(cx0, cnt) + local // nyr
    cy = np.repeat(cy0, cnt) + local % nyr
    return row, cx, cy


def bbox_join(left, right, cell: int = 100, buckets: int | None = None,
              id_cols: tuple[str, str] = ("a_id", "b_id")):
    """Rectangle-intersection join: emit (a_id, b_id, inter_area) for
    every pair of rects (one from `left`, one from `right`) whose
    CLOSED integer boxes [x0,x1]x[y0,y1] intersect. Both inputs need
    columns (id, x0, y0, x1, y1).

    inter_area counts lattice points of the closed intersection
    ((dx+1)*(dy+1)) so the value is integer-exact."""
    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    def explode(side: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            x0 = batch["x0"].to_numpy(zero_copy_only=False).astype(np.int64)
            y0 = batch["y0"].to_numpy(zero_copy_only=False).astype(np.int64)
            x1 = batch["x1"].to_numpy(zero_copy_only=False).astype(np.int64)
            y1 = batch["y1"].to_numpy(zero_copy_only=False).astype(np.int64)
            row, cx, cy = _explode_cells(ids, x0, y0, x1, y1, cell)
            ckey = cx * np.int64(1 << 32) + cy
            b = ((ckey.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                 >> np.uint64(40)).astype(np.int64) % buckets
            return pa.table({
                "_b": pa.array(b.astype(np.int32)),
                "cell": pa.array(ckey),
                "side": pa.array(np.full(len(row), side, dtype=np.int8)),
                "id": pa.array(ids[row]),
                "x0": pa.array(x0[row]), "y0": pa.array(y0[row]),
                "x1": pa.array(x1[row]), "y1": pa.array(y1[row]),
            })
        return f

    cols = ["id", "x0", "y0", "x1", "y1"]
    both = left.select_columns(cols) \
        .map_batches(explode(0), batch_format="pyarrow") \
        .union(right.select_columns(cols)
               .map_batches(explode(1), batch_format="pyarrow"))

    a_col, b_col = id_cols
    empty = pa.table({a_col: pa.array([], type=pa.int64()),
                      b_col: pa.array([], type=pa.int64()),
                      "inter_area": pa.array([], type=pa.int64())})

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "cell" not in g.schema.names:
            return empty
        ck = g["cell"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        x0 = g["x0"].to_numpy(zero_copy_only=False)
        y0 = g["y0"].to_numpy(zero_copy_only=False)
        x1 = g["x1"].to_numpy(zero_copy_only=False)
        y1 = g["y1"].to_numpy(zero_copy_only=False)
        # sort by (cell, side) so each cell is [left-run][right-run]
        order = np.lexsort((side, ck))
        ck, side = ck[order], side[order]
        ids, x0, y0, x1, y1 = (a[order] for a in (ids, x0, y0, x1, y1))
        new = np.ones(len(ck), dtype=bool)
        new[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ck))
        # per-cell left/right counts via the first right index
        first_r = starts + np.add.reduceat((side == 0).astype(np.int64),
                                           starts)
        nl = first_r - starts
        nr = ends - first_r
        m = nl * nr
        keep = m > 0
        if not keep.any():
            return empty
        starts, first_r, nl, nr, m = (a[keep] for a in
                                      (starts, first_r, nl, nr, m))
        # vectorized per-cell cartesian: pair p in cell c ->
        # left index = starts + p // nr, right index = first_r + p % nr
        tot = int(m.sum())
        cellrep = np.repeat(np.arange(len(m), dtype=np.int64), m)
        endsm = np.cumsum(m)
        local = np.arange(tot, dtype=np.int64) - np.repeat(endsm - m, m)
        nrr = np.repeat(nr, m)
        li = np.repeat(starts, m) + local // nrr
        ri = np.repeat(first_r, m) + local % nrr
        ax0, ay0, ax1, ay1 = x0[li], y0[li], x1[li], y1[li]
        bx0, by0, bx1, by1 = x0[ri], y0[ri], x1[ri], y1[ri]
        ix0 = np.maximum(ax0, bx0)
        iy0 = np.maximum(ay0, by0)
        dx = np.minimum(ax1, bx1) - ix0
        dy = np.minimum(ay1, by1) - iy0
        # owner rule: emit only in the cell holding the intersection's
        # min corner
        owner = (ix0 // cell) * np.int64(1 << 32) + (iy0 // cell)
        ok = (dx >= 0) & (dy >= 0) & (owner == ck[li])
        return pa.table({
            a_col: pa.array(ids[li][ok]),
            b_col: pa.array(ids[ri][ok]),
            "inter_area": pa.array((dx[ok] + 1) * (dy[ok] + 1)),
        })

    return both.groupby("_b").map_groups(per_bucket,
                                         batch_format="pyarrow")


def nearest_site(ds, sites_xy: np.ndarray, site_ids: np.ndarray,
                 x_col: str = "x", y_col: str = "y",
                 id_col: str = "id"):
    """Assign every point its nearest site (exact squared euclidean on
    integer coords, ties to the LOWEST site id). Sites are broadcast
    once via ray.put; each map task does one (batch x K) matmul-shaped
    distance pass — no shuffle.

    Returns (id, site_id, d2:int64)."""
    import ray

    order = np.argsort(site_ids, kind="stable")
    ref = ray.put((np.asarray(sites_xy, dtype=np.int64)[order],
                   np.asarray(site_ids, dtype=np.int64)[order]))

    def assign(batch: pa.Table) -> pa.Table:
        xy, sid = ray.get(ref)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = x[:, None] - xy[None, :, 0]
        dy = y[:, None] - xy[None, :, 1]
        d2 = dx * dx + dy * dy
        j = np.argmin(d2, axis=1)  # first minimum = lowest site id
        return pa.table({
            id_col: batch[id_col],
            "site_id": pa.array(sid[j]),
            "d2": pa.array(d2[np.arange(len(x)), j]),
        })

    return ds.select_columns([id_col, x_col, y_col]) \
        .map_batches(assign, batch_format="pyarrow")
