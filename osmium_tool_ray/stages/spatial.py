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


def dense_cell_clusters(points, level: int, min_count: int,
                        lon_col: str = "lon", lat_col: str = "lat",
                        buckets: int | None = None,
                        driver_cap: int = 5_000_000):
    """Grid-DBSCAN: cluster the map's DENSE cells (>= min_count points)
    into 8-connected components — the hotspot-REGION operator on top of
    hotspot_tiles' per-cell z-scores (urban-area detection over the
    image corpus; the reference's closest shape is extract's region
    grouping of objects, /root/reference/src/extract/).

    Scale shape: the corpus collapses to per-cell counts first
    (cell_counts' partial+final combine), so everything after runs at
    dense-cell scale, not point scale. Adjacency forms WITHOUT a join
    operator: every dense cell emits itself as an ANCHOR plus its four
    FORWARD neighbors (E, N, NE, SE) as PROBES keyed by the neighbor
    cell; ONE hash(key)%buckets shuffle co-locates each cell's anchor
    with all probes aimed at it, and a vectorized sorted membership
    test emits the edge list. Components come from
    stages/dedup.connected_components (min-label + pointer jumping past
    driver_cap); singleton dense cells survive via anchor self-pairs.

    Returns (rep:string cluster id, n_cells:int64, total_points:int64)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..functions.cells import cell_to_xy, xy_to_cell
    from .dedup import connected_components
    from .tiles import cell_counts

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    n = np.int64(1 << level)
    # materialize: `dense` is consumed by BOTH the edge builder and the
    # count side, and connected_components consumes pairs twice (count +
    # refs) — without pinning, the corpus-scale cell_counts pass would
    # re-execute once per consumer. Dense cells are pre-aggregated
    # (bounded by the grid), so this is cell-scale, not point-scale.
    dense = cell_counts(points, level, lon_col, lat_col) \
        .filter(expr=f"n_images >= {min_count}").materialize()

    def emit(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        x, y = cell_to_xy(cell.view(np.uint64))
        keys, kinds, srcs = [cell], [np.zeros(len(cell), dtype=np.int8)], \
            [cell]
        for dx, dy in ((1, 0), (0, 1), (1, 1), (1, -1)):
            nx, ny = x + dx, y + dy
            ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
            nb = xy_to_cell(nx[ok], ny[ok], level).view(np.int64)
            keys.append(nb)
            kinds.append(np.ones(len(nb), dtype=np.int8))
            srcs.append(cell[ok])
        key = np.concatenate(keys)
        b = (key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             >> np.uint64(40)).astype(np.int64) % buckets
        return pa.table({"_b": pa.array(b.astype(np.int32)),
                         "key": pa.array(key),
                         "kind": pa.array(np.concatenate(kinds)),
                         "src": pa.array(np.concatenate(srcs))})

    def edges(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.string()),
                          "id_b": pa.array([], type=pa.string())})
        if g.num_rows == 0 or "key" not in g.schema.names:
            return empty
        key = g["key"].to_numpy(zero_copy_only=False)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        src = g["src"].to_numpy(zero_copy_only=False)
        anchors = np.sort(key[kind == 0])
        if len(anchors) == 0:
            return empty
        pk, ps = key[kind == 1], src[kind == 1]
        pos = np.searchsorted(anchors, pk)
        pos_c = np.minimum(pos, len(anchors) - 1)
        hit = (pos < len(anchors)) & (anchors[pos_c] == pk)
        a = np.concatenate([ps[hit], anchors])       # edges + self pairs
        bb = np.concatenate([pk[hit], anchors])
        return pa.table({"id_a": pa.array(a.astype(str), type=pa.string()),
                         "id_b": pa.array(bb.astype(str),
                                          type=pa.string())})

    pairs = dense.map_batches(emit, batch_format="pyarrow") \
        .groupby("_b").map_groups(edges, batch_format="pyarrow") \
        .materialize()
    labels = connected_components(pairs, driver_cap=driver_cap)

    def label_side(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, dtype=np.int32)
        return pa.table({"_b": pa.array(z),
                         "image_id": batch["image_id"].cast(pa.string()),
                         "rep": batch["rep"].cast(pa.string()),
                         "n": pa.array(np.zeros(batch.num_rows,
                                                dtype=np.int64))})

    def count_side(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False)
        s = c.astype(str)
        return pa.table({"_b": pa.array(np.zeros(len(s), dtype=np.int32)),
                         "image_id": pa.array(s, type=pa.string()),
                         "rep": pa.array([""] * len(s), type=pa.string()),
                         "n": batch["n_images"].cast(pa.int64())})

    def merge_bucket(g: pa.Table) -> pa.Table:
        # vectorized label<->count attach: both sides keyed by the cell
        # string, exactly one label row and one count row per cell
        empty = pa.table({"rep": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "image_id" not in g.schema.names:
            return empty
        ids = np.asarray(g["image_id"].to_pylist(), dtype="U32")
        rep = np.asarray(g["rep"].to_pylist(), dtype="U32")
        n = g["n"].to_numpy(zero_copy_only=False)
        is_lab = rep != ""
        lid, lrep = ids[is_lab], rep[is_lab]
        cid, cn = ids[~is_lab], n[~is_lab]
        order = np.argsort(lid, kind="stable")
        lid, lrep = lid[order], lrep[order]
        pos = np.searchsorted(lid, cid)
        ok = (pos < len(lid))
        pos_c = np.minimum(pos, max(len(lid) - 1, 0))
        ok &= lid[pos_c] == cid if len(lid) else False
        if not np.any(ok):
            return empty
        return pa.table({"rep": pa.array(lrep[pos_c[ok]].tolist(),
                                         type=pa.string()),
                         "n": pa.array(cn[ok].astype(np.int64))})

    # hash() on str is salted per-process: compute buckets from a stable
    # hash instead so label/count rows of the same cell co-locate
    from ..functions.hashing import hash_str_u64

    def _stable_b(tbl: pa.Table) -> pa.Table:
        h = hash_str_u64(tbl["image_id"])
        b = (h % np.uint64(buckets)).astype(np.int32)
        return tbl.set_column(tbl.schema.get_field_index("_b"), "_b",
                              pa.array(b))

    both = labels.map_batches(label_side, batch_format="pyarrow") \
        .union(dense.map_batches(count_side, batch_format="pyarrow")) \
        .map_batches(_stable_b, batch_format="pyarrow")
    per = both.groupby("_b").map_groups(merge_bucket,
                                        batch_format="pyarrow")
    return per.groupby("rep").aggregate(
        Count(alias_name="n_cells"), Sum("n", alias_name="total_points"))


def _hull_indices(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over int64 coords -> indices of the strict
    convex hull in CCW order (collinear boundary points dropped).
    Exact integer cross products; input need not be sorted."""
    order = np.lexsort((y, x))
    x, y = x[order], y[order]
    # drop duplicate points
    keep = np.ones(len(x), dtype=bool)
    keep[1:] = (x[1:] != x[:-1]) | (y[1:] != y[:-1])
    order, x, y = order[keep], x[keep], y[keep]
    n = len(x)
    if n <= 2:
        return order[:n]

    def chain(idx):
        out = []
        for i in idx:
            while len(out) >= 2:
                ox, oy = x[out[-2]], y[out[-2]]
                ax, ay = x[out[-1]], y[out[-1]]
                if ((ax - ox) * (y[i] - oy)
                        - (ay - oy) * (x[i] - ox)) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out[:-1]

    lower = chain(range(n))
    upper = chain(range(n - 1, -1, -1))
    return order[np.asarray(lower + upper, dtype=np.int64)]


def convex_hull_per_key(ds, key_col: str, x_col: str, y_col: str,
                        buckets: int | None = None):
    """Per-key convex hull over integer points -> (key, n_hull,
    area2:int64) with area2 the DOUBLED polygon area (shoelace sum of
    integer cross products — exact, no float). The per-region footprint
    operator; the reference's closest shape is extract's region
    envelope handling (/root/reference/src/extract/extract.cpp).

    Scale shape: the hull of a union is a subset of the union of
    hulls, so each batch FIRST collapses to its per-key partial hull
    map-side (the distributed divide-and-conquer hull) — a dense key's
    million points shrink to <= hull-size per input block before the
    ONE key-bucket shuffle; the final per-key chain runs over
    concatenated partial hulls only."""
    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             x_col: pa.array([], type=pa.int64()),
                             y_col: pa.array([], type=pa.int64()),
                             "_b": pa.array([], type=pa.int32())})
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, x, y = k[order], x[order], y[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        sel = []
        for s, e in zip(starts, ends):
            sel.extend((s + _hull_indices(x[s:e], y[s:e])).tolist())
        sel = np.asarray(sel, dtype=np.int64)
        kk = k[sel]
        b = (kk.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return pa.table({key_col: pa.array(kk),
                         x_col: pa.array(x[sel]),
                         y_col: pa.array(y[sel]),
                         "_b": pa.array(b)})

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "n_hull": pa.array([], type=pa.int64()),
                          "area2": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        x = g[x_col].to_numpy(zero_copy_only=False)
        y = g[y_col].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, x, y = k[order], x[order], y[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        keys, nh, a2 = [], [], []
        for s, e in zip(starts, ends):
            hi = _hull_indices(x[s:e], y[s:e])
            hx, hy = x[s:e][hi], y[s:e][hi]
            keys.append(int(k[s]))
            nh.append(len(hi))
            a2.append(int(np.dot(hx, np.roll(hy, -1))
                          - np.dot(hy, np.roll(hx, -1)))
                      if len(hi) >= 3 else 0)
        return pa.table({key_col: pa.array(keys, type=pa.int64()),
                         "n_hull": pa.array(nh, type=pa.int64()),
                         "area2": pa.array(a2, type=pa.int64())})

    return ds.select_columns([key_col, x_col, y_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def snap_to_segments(ds, segments: np.ndarray, seg_ids: np.ndarray,
                     x_col: str = "x", y_col: str = "y",
                     id_col: str = "id"):
    """Map-matching lite: snap each point to its nearest SEGMENT from a
    broadcast polyline set (the add-locations-to-ways inverse: points
    seeking geometry; /root/reference/src/command_add_locations_to_ways
    .cpp enriches geometry with points). Distance is point-to-segment
    with the projection parameter clamped to [0, 1]; squared distances
    compare in float64 (deterministic IEEE — the track_simplify
    convention), ties break to the LOWEST segment id.

    Scale shape: segments ship ONCE via ray.put as packed arrays;
    each map task computes the full (batch x S) distance matrix
    vectorized — no shuffle. For segment sets past worker RAM,
    cell-bucket both sides and run the same kernel per cell (the
    bbox_join partitioning); this implementation is the broadcast
    path.

    Returns (id, seg_id:int64, d2:float64, t1000:int64 — the clamped
    projection parameter in integer thousandths for stable compares)."""
    import ray

    order = np.argsort(seg_ids, kind="stable")
    segs = np.asarray(segments, dtype=np.float64)[order]
    ref = ray.put((segs, np.asarray(seg_ids, dtype=np.int64)[order]))

    def snap(batch: pa.Table) -> pa.Table:
        seg, sid = ray.get(ref)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ax, ay, bx, by = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        px = x[:, None] - ax[None, :]
        py = y[:, None] - ay[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            t = (px * dx[None, :] + py * dy[None, :]) / len2[None, :]
        t = np.nan_to_num(t, nan=0.0)       # degenerate zero-length segs
        np.clip(t, 0.0, 1.0, out=t)
        ex = px - t * dx[None, :]
        ey = py - t * dy[None, :]
        d2 = ex * ex + ey * ey
        j = np.argmin(d2, axis=1)            # first min = lowest seg id
        rows = np.arange(len(x))
        return pa.table({
            id_col: batch[id_col],
            "seg_id": pa.array(sid[j]),
            "d2": pa.array(d2[rows, j]),
            "t1000": pa.array(np.floor(t[rows, j] * 1000.0)
                              .astype(np.int64)),
        })

    return ds.select_columns([id_col, x_col, y_col]) \
        .map_batches(snap, batch_format="pyarrow")


def resample_tracks(ds, key_col: str, ts_col: str, tie_col: str,
                    value_cols: list[str], dt: int,
                    buckets: int | None = None):
    """Fixed-interval track resampling — linear interpolation of each
    key's trajectory onto the global time grid t = k*dt (the GPS
    track-densification / sensor-alignment op; the continuous dual of
    tumbling_window's bucket assignment). For every consecutive point
    pair (ordered by (ts, tie)) each grid instant g with t0 <= g < t1
    emits one row with every value column interpolated as
    v0 + (v1 - v0) * ((g - t0) / (t1 - t0)).

    Inputs are INTEGERS (timestamps in epoch-us, values in fixed-point
    units), so the interpolation is a fixed three-op IEEE float64
    expression mirrored bit-exactly by the SQL oracle (the
    snap_to_segments float-mirror discipline). Zero-length pairs
    (t1 == t0, duplicate timestamps) span no grid instant and emit
    nothing, identically on both sides.

    ONE hash(key)-bucket shuffle; in-bucket the pair chain, per-pair
    grid counts, and the repeat-expand interpolation are all vectorized
    (no per-track Python). Output row count is sum(gap_i) / dt — the
    caller sizes `dt` to the target density exactly as it would size a
    tumbling window.

    Returns (key_col, ts_grid:int64, <value_cols>:float64)."""
    import ray

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    dt = np.int64(dt)
    cols = [key_col, ts_col, tie_col, *value_cols]

    def pre(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        k = batch[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = (k % np.int64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = {key_col: pa.array([], type=pa.int64()),
                 "ts_grid": pa.array([], type=pa.int64())}
        for vc in value_cols:
            empty[vc] = pa.array([], type=pa.float64())
        if g.num_rows == 0 or ts_col not in g.schema.names:
            return pa.table(empty)
        key = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = g[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = [g[vc].to_numpy(zero_copy_only=False).astype(np.int64)
                for vc in value_cols]
        order = np.lexsort((tie, t, key))
        key, t = key[order], t[order]
        vals = [v[order] for v in vals]
        same = key[1:] == key[:-1]               # valid pair mask
        t0, t1 = t[:-1][same], t[1:][same]
        pk = key[:-1][same]
        gstart = ((t0 + dt - 1) // dt) * dt
        cnt = np.where(t1 > gstart, (t1 - 1 - gstart) // dt + 1, 0)
        total = int(cnt.sum())
        if total == 0:
            return pa.table(empty)
        rep = np.repeat(np.arange(len(cnt)), cnt)
        within = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        tg = gstart[rep] + within * dt
        frac = (tg - t0[rep]) / (t1[rep] - t0[rep])
        out = {key_col: pa.array(pk[rep]), "ts_grid": pa.array(tg)}
        for vc, v in zip(value_cols, vals):
            v0, v1 = v[:-1][same], v[1:][same]
            out[vc] = pa.array(v0[rep] + (v1[rep] - v0[rep]) * frac,
                               type=pa.float64())
        return pa.table(out)

    return ds.map_batches(pre, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def radius_join(ds, id_col: str, x_col: str, y_col: str, radius: int,
                coarse: int | None = None, pair_chunk: int = 4_000_000,
                offset: int = 2_147_483_648):
    """EXACT within-radius spatial self-join: every unordered pair of
    points with squared L2 distance <= radius^2, in exact int64
    arithmetic. The distance-threshold companion of bbox_join (reference
    relative: extract's grid-prefiltered containment test generalized to
    pair proximity, /root/reference/src/extract/extract_bbox.cpp:30-43).

    Scale shape: grid blocking at cell = radius — each point explodes
    map-side into its home cell plus the 8 neighbors (narrow (cell,
    home, id, x, y) projection, 9x fan-out), then ONE hash(cell)%coarse
    shuffle. Inside a coarse group every cell run generates its pairs
    fully vectorized (cumsum-offset cartesian, no per-cell Python), in
    slices of `pair_chunk` flat pair indices so peak memory stays
    bounded no matter how dense one cell is. A pair is emitted ONLY in
    min(home_a, home_b) — any qualifying pair differs by <= 1 cell per
    axis, so both points are present in that cell's run and output pairs
    are distinct BY CONSTRUCTION (the bbox_join owner rule); no
    pair-dedup shuffle runs. Hot-cell note: a cell denser than
    ~sqrt(pair_chunk) points produces inherently quadratic OUTPUT — the
    slicing bounds memory, not the result size, which is the operator's
    own semantics.

    Coordinates plus `offset` must be nonnegative and (coord+offset)/
    radius must fit 32 bits. Returns (a, b, d2) with a < b in id order."""
    import ray

    if coarse is None:
        coarse = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    r = np.int64(radius)
    r2 = r * r
    OFF = np.int64(offset)

    s = ds.schema()
    id_type = dict(zip(s.names, s.types))[id_col]
    empty = pa.table({"a": pa.array([], type=id_type),
                      "b": pa.array([], type=id_type),
                      "d2": pa.array([], type=pa.int64())})
    from ..functions.hashing import splitmix64

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist())
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = (x + OFF) // r
        cy = (y + OFF) // r
        home = (cx << np.int64(32)) | cy
        n = len(ids)
        rep = np.repeat(np.arange(n, dtype=np.int64), 9)
        dxy = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                       dtype=np.int64)
        cell = ((np.repeat(cx, 9) + np.tile(dxy[:, 0], n)) << np.int64(32)) \
            | (np.repeat(cy, 9) + np.tile(dxy[:, 1], n))
        return pa.table({
            "cell": pa.array(cell),
            "home": pa.array(home[rep]),
            id_col: pa.array(ids[rep].tolist(), type=id_type),
            "x": pa.array(x[rep]), "y": pa.array(y[rep]),
            "_cb": pa.array((splitmix64(cell.view(np.uint64))
                             % np.uint64(coarse)).astype(np.int32))})

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "cell" not in g.schema.names:
            return empty
        ck = g["cell"].to_numpy(zero_copy_only=False)
        home = g["home"].to_numpy(zero_copy_only=False)
        ids = np.asarray(g[id_col].to_pylist())
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ck))
        ck, home, ids, x, y = (a[order] for a in (ck, home, ids, x, y))
        new = np.ones(len(ck), dtype=bool)
        new[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(ck)))
        multi = lens > 1
        if not multi.any():
            return empty
        starts, lens = starts[multi], lens[multi]
        cells = ck[starts]
        m = lens * lens                      # ordered cartesian per run
        ends = np.cumsum(m)
        tot = int(ends[-1])
        out = []
        lo = 0
        while lo < tot:
            hi = min(lo + pair_chunk, tot)
            flat = np.arange(lo, hi, dtype=np.int64)
            runi = np.searchsorted(ends, flat, side="right")
            local = flat - (ends[runi] - m[runi])
            li = starts[runi] + local // lens[runi]
            ri = starts[runi] + local % lens[runi]
            up = li < ri                     # each unordered pair once
            li, ri, runi = li[up], ri[up], runi[up]
            dx = x[li] - x[ri]
            dy = y[li] - y[ri]
            d2 = dx * dx + dy * dy
            ok = d2 <= r2
            ok &= np.minimum(home[li], home[ri]) == cells[runi]
            if ok.any():
                a_, b_ = ids[li[ok]], ids[ri[ok]]
                swap = a_ > b_
                a2 = np.where(swap, b_, a_)
                b2 = np.where(swap, a_, b_)
                out.append(pa.table({
                    "a": pa.array(a2.tolist(), type=id_type),
                    "b": pa.array(b2.tolist(), type=id_type),
                    "d2": pa.array(d2[ok])}))
            lo = hi
        return pa.concat_tables(out) if out else empty

    return ds.select_columns([id_col, x_col, y_col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("_cb").map_groups(per_group, batch_format="pyarrow")


def track_segments(ds, key_col: str, ts_col: str, x_col: str,
                   y_col: str, tie_col: str | None = None):
    """Consecutive-point segments of each key's track in timestamp
    order: (key, x1, y1, x2, y2), one row per consecutive pair — the
    shared front end of segment_crossings / corridor ops. ONE
    hash(key)%buckets shuffle of the narrow projection, multi-key
    vectorized lexsort fold per bucket (the track_length shape)."""
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key_col not in g.schema.names:
            return pa.table({key_col: pa.array([], type=key_type)}
                            | {c: pa.array([], type=pa.int64())
                               for c in ("x1", "y1", "x2", "y2")})
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tie, ts, keys.astype(str)))
        ks, xs, ys = keys[order], x[order], y[order]
        same = ks[1:] == ks[:-1]             # row i starts a segment
        i = np.flatnonzero(same)
        return pa.table({
            key_col: pa.array(ks[i].tolist(), type=key_type),
            "x1": pa.array(xs[i]), "y1": pa.array(ys[i]),
            "x2": pa.array(xs[i + 1]), "y2": pa.array(ys[i + 1])})

    from ..blocks import group_by_key_bucket

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, x_col, y_col]
                           + ([tie_col] if tie_col else []))))
    return group_by_key_bucket(narrow, key_col, per_group)


def segment_crossings(segs, key_col: str, cell: int,
                      coarse: int | None = None,
                      pair_chunk: int = 4_000_000,
                      offset: int = 2_147_483_648):
    """EXACT proper-intersection join between track segments of
    DIFFERENT keys: for every unordered key pair, the number of segment
    pairs that properly cross (strict orientation test — endpoints
    touching or collinear overlap do not count). All arithmetic is
    integer sign tests on int64 cross products, so the distributed
    result is bit-identical to a SQL CASE oracle (reference relative:
    osmium extract's banded segment/ray crossing rule,
    /root/reference/src/extract/extract_polygon.cpp:150-210, turned
    into a segment-vs-segment join).

    Scale shape: each segment explodes map-side to the grid cells its
    bbox covers at `cell` resolution, then ONE hash(cell)%coarse
    shuffle. Inside a group every cell run generates ordered cartesian
    candidate pairs in `pair_chunk` slices (the radius_join chunking);
    a pair is TESTED only in the cell at the min corner of the two
    bboxes' intersection — that cell is in both covers whenever the
    bboxes meet, so pairs are distinct by construction and no dedup
    shuffle runs. Cell-level pair counts pre-aggregate in-group before
    the final (a, b) Sum. Real GPS segments are short relative to any
    sensible `cell`, so covers are O(1) cells; a segment spanning many
    cells degrades fan-out linearly, never correctness.

    `segs` must have (key, x1, y1, x2, y2) int64 columns — the
    track_segments output. Coordinates plus `offset` must be
    nonnegative. Returns (a, b, n_crossings) with a < b."""
    import ray
    from ray.data.aggregate import Sum

    if coarse is None:
        coarse = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    C = np.int64(cell)
    OFF = np.int64(offset)
    s = segs.schema()
    key_type = dict(zip(s.names, s.types))[key_col]
    empty = pa.table({"a": pa.array([], type=key_type),
                      "b": pa.array([], type=key_type),
                      "n_crossings": pa.array([], type=pa.int64())})
    from ..functions.hashing import splitmix64

    def explode(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].to_pylist())
        x1 = batch["x1"].to_numpy(zero_copy_only=False) + OFF
        y1 = batch["y1"].to_numpy(zero_copy_only=False) + OFF
        x2 = batch["x2"].to_numpy(zero_copy_only=False) + OFF
        y2 = batch["y2"].to_numpy(zero_copy_only=False) + OFF
        cx0 = np.minimum(x1, x2) // C
        cx1 = np.maximum(x1, x2) // C
        cy0 = np.minimum(y1, y2) // C
        cy1 = np.maximum(y1, y2) // C
        nx = (cx1 - cx0 + 1)
        cnt = nx * (cy1 - cy0 + 1)
        rep = np.repeat(np.arange(len(keys), dtype=np.int64), cnt)
        ends = np.cumsum(cnt)
        local = np.arange(int(ends[-1]), dtype=np.int64) \
            - np.repeat(ends - cnt, cnt)
        ccx = cx0[rep] + local % nx[rep]
        ccy = cy0[rep] + local // nx[rep]
        cellk = (ccx << np.int64(32)) | ccy
        return pa.table({
            "cell": pa.array(cellk),
            key_col: pa.array(keys[rep].tolist(), type=key_type),
            "x1": pa.array(x1[rep]), "y1": pa.array(y1[rep]),
            "x2": pa.array(x2[rep]), "y2": pa.array(y2[rep]),
            "cx0": pa.array(cx0[rep]), "cy0": pa.array(cy0[rep]),
            "_cb": pa.array((splitmix64(cellk.view(np.uint64))
                             % np.uint64(coarse)).astype(np.int32))})

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "cell" not in g.schema.names:
            return empty
        ck = g["cell"].to_numpy(zero_copy_only=False)
        keys = np.asarray(g[key_col].to_pylist())
        x1 = g["x1"].to_numpy(zero_copy_only=False)
        y1 = g["y1"].to_numpy(zero_copy_only=False)
        x2 = g["x2"].to_numpy(zero_copy_only=False)
        y2 = g["y2"].to_numpy(zero_copy_only=False)
        cx0 = g["cx0"].to_numpy(zero_copy_only=False)
        cy0 = g["cy0"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, ck))
        ck, keys, x1, y1, x2, y2, cx0, cy0 = (
            a[order] for a in (ck, keys, x1, y1, x2, y2, cx0, cy0))
        new = np.ones(len(ck), dtype=bool)
        new[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(ck)))
        multi = lens > 1
        if not multi.any():
            return empty
        starts, lens = starts[multi], lens[multi]
        cells = ck[starts]
        m = lens * lens
        ends = np.cumsum(m)
        tot = int(ends[-1])
        out = []
        lo = 0
        while lo < tot:
            hi = min(lo + pair_chunk, tot)
            flat = np.arange(lo, hi, dtype=np.int64)
            runi = np.searchsorted(ends, flat, side="right")
            local = flat - (ends[runi] - m[runi])
            li = starts[runi] + local // lens[runi]
            ri = starts[runi] + local % lens[runi]
            up = li < ri
            li, ri, runi = li[up], ri[up], runi[up]
            diff = keys[li] != keys[ri]
            li, ri, runi = li[diff], ri[diff], runi[diff]
            # owner rule: test only at the min corner of the bbox
            # intersection (in both covers whenever the bboxes meet)
            ox = np.maximum(cx0[li], cx0[ri])
            oy = np.maximum(cy0[li], cy0[ri])
            own = ((ox << np.int64(32)) | oy) == cells[runi]
            li, ri = li[own], ri[own]
            if len(li):
                d1 = ((x2[ri] - x1[ri]) * (y1[li] - y1[ri])
                      - (x1[li] - x1[ri]) * (y2[ri] - y1[ri]))
                d2 = ((x2[ri] - x1[ri]) * (y2[li] - y1[ri])
                      - (x2[li] - x1[ri]) * (y2[ri] - y1[ri]))
                d3 = ((x2[li] - x1[li]) * (y1[ri] - y1[li])
                      - (x1[ri] - x1[li]) * (y2[li] - y1[li]))
                d4 = ((x2[li] - x1[li]) * (y2[ri] - y1[li])
                      - (x2[ri] - x1[li]) * (y2[li] - y1[li]))
                cross = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
                    & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
                if cross.any():
                    ka, kb = keys[li[cross]], keys[ri[cross]]
                    swap = ka > kb
                    a_ = np.where(swap, kb, ka)
                    b_ = np.where(swap, ka, kb)
                    pk = np.stack([a_, b_], axis=1)
                    u, c = np.unique(pk, axis=0, return_counts=True)
                    out.append(pa.table({
                        "a": pa.array(u[:, 0].tolist(), type=key_type),
                        "b": pa.array(u[:, 1].tolist(), type=key_type),
                        "n_crossings": pa.array(c.astype(np.int64))}))
            lo = hi
        return pa.concat_tables(out) if out else empty

    cands = segs.select_columns([key_col, "x1", "y1", "x2", "y2"]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("_cb").map_groups(per_group, batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        # the same track pair can cross in many cells, so the per-group
        # partials need one final (a, b) sum. Ray's native groupby paid
        # ~85 s of remote time on 516k pair groups at sf0.1; this ONE
        # hash(a,b)-bucket shuffle + lexsort/reduceat fold replaces it.
        if g.num_rows == 0:
            return empty
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        n = g["n_crossings"].to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b, n = a[o], b[o], n[o]
        runs = np.flatnonzero(np.r_[True, (a[1:] != a[:-1])
                                    | (b[1:] != b[:-1])])
        tot = np.add.reduceat(n, runs)
        return pa.table({"a": pa.array(a[runs].tolist(), type=key_type),
                         "b": pa.array(b[runs].tolist(), type=key_type),
                         "n_crossings": pa.array(tot.astype(np.int64))})

    from ..blocks import group_by_key_bucket
    return group_by_key_bucket(cands, ["a", "b"], fold)


def corridor_points(ds, x_col: str, y_col: str, segments, radius: int,
                    seg_chunk: int = 512):
    """Filter points to those within `radius` of ANY segment of a
    reference polyline — the corridor / buffer-membership join
    (reference relative: osmium extract's polygon containment test,
    /root/reference/src/extract/extract_polygon.cpp:150-210, with the
    region swapped for a distance buffer around a line).

    EXACT integer arithmetic, no sqrt or division: with d = b - a,
    dot = d.(p - a), len2 = |d|^2, the squared point-segment distance
    test is  |p-a|^2 <= r^2        when dot <= 0 (or len2 == 0),
             |p-b|^2 <= r^2        when dot >= len2,
             cross(d, p-a)^2 <= r^2 * len2   otherwise
    — bit-identical to the SQL CASE oracle.

    Scale shape: the polyline is the SMALL side — shipped once via
    ray.put and read zero-copy by every map task (the broadcast-lookup
    pattern); points stream through a stateless map_batches, testing
    `seg_chunk` segments at a time so the (batch x chunk) temporaries
    stay bounded however long the polyline is. All input columns pass
    through unchanged."""
    import ray

    if isinstance(segments, pa.Table):
        sx1 = segments["x1"].to_numpy(zero_copy_only=False)
        sy1 = segments["y1"].to_numpy(zero_copy_only=False)
        sx2 = segments["x2"].to_numpy(zero_copy_only=False)
        sy2 = segments["y2"].to_numpy(zero_copy_only=False)
    else:
        sx1, sy1, sx2, sy2 = (np.asarray(segments[k], dtype=np.int64)
                              for k in ("x1", "y1", "x2", "y2"))
    r2 = np.int64(radius) * np.int64(radius)
    seg_ref = ray.put((sx1.astype(np.int64), sy1.astype(np.int64),
                       sx2.astype(np.int64), sy2.astype(np.int64)))

    def keep(batch: pa.Table) -> pa.Table:
        ax1, ay1, ax2, ay2 = ray.get(seg_ref)
        px = batch[x_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[:, None]
        py = batch[y_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[:, None]
        hit = np.zeros(len(px), dtype=bool)
        for lo in range(0, len(ax1), seg_chunk):
            todo = ~hit
            if not todo.any():
                break
            x1 = ax1[None, lo:lo + seg_chunk]
            y1 = ay1[None, lo:lo + seg_chunk]
            dx = ax2[None, lo:lo + seg_chunk] - x1
            dy = ay2[None, lo:lo + seg_chunk] - y1
            qx = px[todo] - x1
            qy = py[todo] - y1
            len2 = dx * dx + dy * dy
            dot = dx * qx + dy * qy
            da2 = qx * qx + qy * qy                    # |p - a|^2
            ex = qx - dx                               # p - b
            ey = qy - dy
            db2 = ex * ex + ey * ey
            cr = dx * qy - dy * qx
            near = np.where(
                (dot <= 0) | (len2 == 0), da2 <= r2,
                np.where(dot >= len2, db2 <= r2, cr * cr <= r2 * len2))
            hit[todo] = near.any(axis=1)
        return batch.filter(pa.array(hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def ripley_pair_counts(ds, id_col: str, x_col: str, y_col: str,
                       radii, coarse: int | None = None,
                       pair_chunk: int = 4_000_000):
    """Ripley's K-function numerator: for each radius r in `radii`, the
    EXACT number of unordered point pairs with squared L2 distance
    <= r^2 (Ripley 1976's sum_{i<j} 1[d_ij <= r]; the K estimate is
    n_pairs * 2 * A / n^2 — left to the caller since A is a modeling
    choice). The spatial point-pattern clustering statistic companion
    of moran_i (stages/raster.py).

    Scale shape: ONE radius_join at max(radii) — grid-blocked, owner
    rule, pair-chunked — then each pair's d2 bins into the cumulative
    radius counts per batch (searchsorted + bincount + suffix cumsum:
    len(radii) partial rows per block, a constant-size mergeable
    partial), ONE tiny groupby(r) Sum finish. A zeros table unions in
    so every radius appears even with no qualifying pairs.

    Returns (r:int64, n_pairs:int64), one row per radius."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    rad = np.sort(np.asarray(list(radii), dtype=np.int64))
    r2s = rad * rad
    pairs = radius_join(ds, id_col, x_col, y_col, int(rad[-1]),
                        coarse=coarse, pair_chunk=pair_chunk)

    def partial(batch: pa.Table) -> pa.Table:
        d2 = batch["d2"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(r2s, d2, side="left")
        cnt = np.bincount(idx, minlength=len(r2s) + 1)[:len(r2s)]
        cum = np.cumsum(cnt)
        return pa.table({"r": pa.array(rad),
                         "n_pairs": pa.array(cum.astype(np.int64))})

    zeros = rd.from_arrow(pa.table({
        "r": pa.array(rad),
        "n_pairs": pa.array(np.zeros(len(rad), dtype=np.int64))}))
    return pairs.map_batches(partial, batch_format="pyarrow") \
        .union(zeros).groupby("r") \
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))


def hausdorff_to_ref(ds, key_col: str, x_col: str, y_col: str,
                     ref_xy: np.ndarray, chunk: int = 8192,
                     buckets: int | None = None):
    """Trajectory similarity vs a query track: per-key directed and
    symmetric Hausdorff distances (squared, exact int64) between each
    key's point set A and a broadcast reference point set R —
    h(A,R) = max_{a} min_{r} d2(a,r), h(R,A) = max_{r} min_{a} d2(a,r),
    H = max of the two (Alt & Godau's discrete Hausdorff; the distance
    every trajectory-clustering survey baselines against).

    Scale shape: R is ONE track (small by nature — the corridor_points
    broadcast argument); points stream through a stateless map that
    emits two mergeable partials per batch:
      * per-key max of per-point min-over-R      (ridx = -1, Max-merge)
      * per-(key, ridx) min over the batch's points (Min-merge)
    then ONE native (key, ridx) groupby folds partials losslessly, a
    narrow (key, side) Max groupby collapses the R-side mins, and one
    group_by_key_bucket pivot emits a single row per key. Intermediate
    volume is O(keys x |R|) — never O(points x |R|) past the map.

    The reference's closest operation is the extract polygon distance
    test (/root/reference/src/extract/geojson_file_parser.cpp ring
    handling); the quantized-integer exactness contract matches
    corridor_points/segment_crossings (stages/spatial.py above).
    """
    import ray.data
    from ray.data.aggregate import Max, Min

    from ..blocks import group_by_key_bucket

    rx = np.ascontiguousarray(ref_xy[:, 0], dtype=np.int64)
    ry = np.ascontiguousarray(ref_xy[:, 1], dtype=np.int64)
    nref = len(rx)
    if nref == 0:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], type=pa.int64()),
            "h_ab": pa.array([], type=pa.int64()),
            "h_ba": pa.array([], type=pa.int64()),
            "h_sym": pa.array([], type=pa.int64())}))

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(k, kind="stable")
        k, x, y = k[o], x[o], y[o]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        uk = k[starts]
        amax = np.zeros(len(uk), dtype=np.int64)       # h(A,R) partial
        rmin = np.full((len(uk), nref), np.int64(1) << 62)
        for lo in range(0, len(k), chunk):
            hi = min(lo + chunk, len(k))
            dx = x[lo:hi, None] - rx[None, :]
            dy = y[lo:hi, None] - ry[None, :]
            d2 = dx * dx + dy * dy
            pmin = d2.min(axis=1)
            # segment boundaries restricted to this chunk
            seg = np.unique(np.clip(starts, lo, hi)) - lo
            seg = seg[seg < (hi - lo)]
            first_seg = np.searchsorted(starts, lo, side="right") - 1
            idx = first_seg + np.arange(len(seg))
            np.maximum.at(amax, idx,
                          np.maximum.reduceat(pmin, seg))
            np.minimum.at(rmin, idx,
                          np.minimum.reduceat(d2, seg, axis=0))
        keys_out = np.concatenate([uk, np.repeat(uk, nref)])
        ridx_out = np.concatenate([
            np.full(len(uk), -1, dtype=np.int64),
            np.tile(np.arange(nref, dtype=np.int64), len(uk))])
        m_out = np.concatenate([amax, rmin.ravel()])
        return pa.table({key_col: pa.array(keys_out),
                         "ridx": pa.array(ridx_out),
                         "m": pa.array(m_out)})

    def fold(g: pa.Table) -> pa.Table:
        # merge the mergeable partials and finish, all keys of the
        # bucket at once: per (key, ridx) run -> max for the ridx=-1
        # rows (h(A,R) partials), min for the ridx>=0 rows (per-ref-
        # point candidate mins), then per key -> h_ba = max over the
        # ridx>=0 mins. Ray's native multi-key Min/Max aggregate paid
        # ~35 s of remote time on 97k groups here; this ONE bucket
        # shuffle + reduceat fold does the same merge in milliseconds.
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "h_ab": pa.array([], type=pa.int64()),
                             "h_ba": pa.array([], type=pa.int64()),
                             "h_sym": pa.array([], type=pa.int64())})
        k = g[key_col].to_numpy(zero_copy_only=False)
        ridx = g["ridx"].to_numpy(zero_copy_only=False)
        m = g["m"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ridx, k))
        k, ridx, m = k[o], ridx[o], m[o]
        n = len(k)
        runs = np.flatnonzero(np.r_[True, (k[1:] != k[:-1])
                                    | (ridx[1:] != ridx[:-1])])
        rk, rr = k[runs], ridx[runs]
        rmax = np.maximum.reduceat(m, runs)
        rmin = np.minimum.reduceat(m, runs)
        merged = np.where(rr < 0, rmax, rmin)
        # per key: first run is ridx=-1 (sorted ascending) = h_ab;
        # the rest are the per-ref mins -> h_ba = their max
        kstart = np.flatnonzero(np.r_[True, rk[1:] != rk[:-1]])
        ab = merged[kstart]                       # ridx=-1 run
        # max over the remaining runs of each key segment: neutralize
        # the first run (distances are >= 0, so -1 is a safe neutral)
        # and reduce over the key boundaries themselves
        nrun = np.diff(np.r_[kstart, len(rk)])
        merged2 = merged.copy()
        merged2[kstart] = -1
        ba = np.maximum.reduceat(merged2, kstart)
        ba = np.where(nrun > 1, ba, ab)           # lone-run safety
        return pa.table({key_col: pa.array(rk[kstart]),
                         "h_ab": pa.array(ab.astype(np.int64)),
                         "h_ba": pa.array(ba.astype(np.int64)),
                         "h_sym": pa.array(np.maximum(ab, ba)
                                           .astype(np.int64))})

    # large batches: every batch emits O(keys_in_batch x |R|) partial
    # rows, so fewer/bigger batches shrink the shuffle multiplicatively
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=32768)
    return group_by_key_bucket(partials, key_col, fold, buckets=buckets)


def map_match_viterbi(ds, key_col: str, ts_col: str, tie_col: str,
                      x_col: str, y_col: str, segments: np.ndarray,
                      seg_ids: np.ndarray, penalty: float,
                      buckets: int | None = None):
    """HMM map matching (Newson & Krumm 2009, the standard GPS-trace ->
    road-segment aligner, simplified to a constant switch penalty):
    per key, the Viterbi-optimal segment assignment minimizing
    sum(point-to-segment d2) + penalty * (#segment switches). Emission
    distances use the snap_to_segments kernel (clamped projection,
    float64, deterministic IEEE); the constant-penalty transition makes
    the DP step min(prev[c], min_all_prev + penalty) — exact, O(S) per
    step instead of O(S^2).

    Scale shape: the road set broadcasts ONCE via ray.put (bounded by
    worker RAM — the snap_to_segments contract; cell-bucket both sides
    past it); points take ONE group_by_key_bucket shuffle, and the fold
    runs the DP vectorized ACROSS every key of the bucket at once —
    rows sort by (key, ts, tie), so a row's predecessor is literally
    the previous row, and stepping per-key RANK r advances all keys'
    r-th points in one numpy slice; the backtrack walks the same ranks
    in reverse. No per-key Python. Sequential-DP semantics are not
    SQL-expressible (rows-only operator; pytest pins a scalar Viterbi).

    Returns (key, tie, seg_id, emit_d2)."""
    import ray

    from ..blocks import group_by_key_bucket

    order = np.argsort(seg_ids, kind="stable")
    segs = np.asarray(segments, dtype=np.float64)[order]
    ref = ray.put((segs, np.asarray(seg_ids, dtype=np.int64)[order],
                   float(penalty)))

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch[key_col],
                         "ts": batch[ts_col].cast(pa.timestamp("us"))
                         .cast(pa.int64()),
                         "t": batch[tie_col],
                         "x": batch[x_col], "y": batch[y_col]})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          tie_col: pa.array([], type=pa.int64()),
                          "seg_id": pa.array([], type=pa.int64()),
                          "emit_d2": pa.array([], type=pa.float64())})
        if g.num_rows == 0:
            return empty
        seg, sid, pen = ray.get(ref)
        if len(seg) == 0:       # empty road set matches nothing
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = g["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.lexsort((t, ts, k))
        k, t, x, y = k[o], t[o], x[o], y[o]
        n = len(k)
        ax, ay, bx, by = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
        dxs, dys = bx - ax, by - ay
        len2 = dxs * dxs + dys * dys
        px = x[:, None] - ax[None, :]
        py = y[:, None] - ay[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            tt = (px * dxs[None, :] + py * dys[None, :]) / len2[None, :]
        tt = np.nan_to_num(tt, nan=0.0)
        np.clip(tt, 0.0, 1.0, out=tt)
        ex = px - tt * dxs[None, :]
        ey = py - tt * dys[None, :]
        emit = ex * ex + ey * ey                       # (n, S)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        nseg = np.diff(np.r_[starts, n])
        r = np.arange(n) - np.repeat(starts, nseg)
        cost = emit.copy()
        jumped = np.zeros(emit.shape, dtype=bool)
        for step in range(1, int(nseg.max())):
            idx = np.flatnonzero(r == step)
            if not len(idx):
                break
            prev = idx - 1
            pmin = cost[prev].min(axis=1)
            jump = pmin[:, None] + pen
            stay = cost[prev]
            jumped[idx] = jump < stay
            cost[idx] += np.minimum(stay, jump)
        sel = np.empty(n, dtype=np.int64)
        lasts = np.r_[starts[1:] - 1, n - 1]
        sel[lasts] = np.argmin(cost[lasts], axis=1)
        for step in range(int(nseg.max()) - 1, 0, -1):
            idx = np.flatnonzero(r == step)
            if not len(idx):
                continue
            prev = idx - 1
            came_jump = jumped[idx, sel[idx]]
            pargmin = np.argmin(cost[prev], axis=1)
            sel[prev] = np.where(came_jump, pargmin, sel[idx])
        rows = np.arange(n)
        return pa.table({key_col: pa.array(k),
                         tie_col: pa.array(t),
                         "seg_id": pa.array(sid[sel]),
                         "emit_d2": pa.array(emit[rows, sel])})

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, tie_col, x_col, y_col]))) \
        .map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def dtw_to_ref(ds, key_col: str, ts_col: str, tie_col: str,
               x_col: str, y_col: str, ref_xy: np.ndarray,
               band: int | None = None, buckets: int | None = None):
    """Dynamic-time-warping distance of every key's (ts, tie)-ordered
    track to a broadcast reference track (Sakoe & Chiba 1978; the
    sequential-alignment companion of hausdorff_to_ref — Hausdorff
    ignores order, DTW charges for it). Cost = sum of exact int64
    squared distances along the optimal monotone alignment; optional
    Sakoe-Chiba band constraint |i*m/n - j| <= band.

    Same scale shape as map_match_viterbi: the reference broadcasts
    ONCE, points take ONE group_by_key_bucket shuffle, and the DP runs
    vectorized ACROSS every key of a bucket — after the (key, ts, tie)
    lexsort a row's predecessor is the previous row, so stepping per-key
    rank r advances all keys' r-th points at once; the inner loop runs
    over the |R| reference positions (the DP's own data dependency).
    All-integer costs make results bit-stable. Sequential DP is not
    SQL-expressible (rows-only; pytest pins a scalar DTW).

    Returns one row per key: (key, dtw_d2, n_points)."""
    import ray

    from ..blocks import group_by_key_bucket

    rx = np.ascontiguousarray(ref_xy[:, 0], dtype=np.int64)
    ry = np.ascontiguousarray(ref_xy[:, 1], dtype=np.int64)
    ref = ray.put((rx, ry))
    m = len(rx)
    BIG = np.int64(1) << 60

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch[key_col],
                         "ts": batch[ts_col].cast(pa.timestamp("us"))
                         .cast(pa.int64()),
                         "t": batch[tie_col],
                         "x": batch[x_col], "y": batch[y_col]})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "dtw_d2": pa.array([], type=pa.int64()),
                          "n_points": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or m == 0:
            return empty
        rxa, rya = ray.get(ref)
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((t, ts, k))
        k, x, y = k[o], x[o], y[o]
        n = len(k)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        nseg = np.diff(np.r_[starts, n])
        nk = len(starts)
        r = np.arange(n) - np.repeat(starts, nseg)
        # DP state per KEY: one row of m costs, advanced rank by rank
        state = np.full((nk, m), BIG)
        out = np.full(nk, BIG)
        maxr = int(nseg.max())
        seg_of = np.repeat(np.arange(nk), nseg)
        for step in range(maxr):
            idx = np.flatnonzero(r == step)
            if not len(idx):
                break
            ks = seg_of[idx]
            dx = x[idx, None] - rxa[None, :]
            dy = y[idx, None] - rya[None, :]
            d2 = dx * dx + dy * dy
            if band is not None:
                # Sakoe-Chiba: |step * m / n_k - j| <= band
                ctr = (step * m) // nseg[ks]
                j = np.arange(m)[None, :]
                d2 = np.where(np.abs(j - ctr[:, None]) <= band, d2, BIG)
            prev = state[ks]
            cur = np.empty_like(prev)
            if step == 0:
                # classic DTW anchors (0,0): D(0, j) = D(0, j-1) + d(0, j)
                cur[:, 0] = d2[:, 0]
                for j in range(1, m):
                    cur[:, j] = cur[:, j - 1] + d2[:, j]
            else:
                diag = np.empty_like(prev)
                diag[:, 0] = BIG
                diag[:, 1:] = prev[:, :-1]
                best = np.minimum(prev, diag)
                cur[:, 0] = prev[:, 0] + d2[:, 0]
                for j in range(1, m):
                    b = np.minimum(best[:, j], cur[:, j - 1])
                    cur[:, j] = b + d2[:, j]
            # saturate: chained out-of-band BIG penalties would overflow
            # int64; any cost >= BIG means "unreachable"
            np.minimum(cur, BIG, out=cur)
            state[ks] = cur
            ends = nseg[ks] - 1 == step
            if ends.any():
                out[ks[ends]] = cur[ends, m - 1]
        return pa.table({key_col: pa.array(k[starts]),
                         "dtw_d2": pa.array(out),
                         "n_points": pa.array(nseg.astype(np.int64))})

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, tie_col, x_col, y_col]))) \
        .map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def frechet_to_ref(ds, key_col: str, ts_col: str, tie_col: str,
                   x_col: str, y_col: str, ref_xy: np.ndarray,
                   buckets: int | None = None):
    """Discrete Frechet distance of every key's (ts, tie)-ordered track
    to a broadcast reference track (Eiter & Mannila 1994) — the
    bottleneck companion of dtw_to_ref: DTW sums alignment costs,
    Frechet takes the MAXIMUM leash length over the optimal monotone
    coupling (F(i,j) = max(d(i,j), min(F(i-1,j), F(i-1,j-1),
    F(i,j-1)))). Exact int64 squared distances, so results are
    bit-stable.

    Same scale shape as dtw_to_ref: reference broadcast ONCE, points
    take ONE group_by_key_bucket shuffle, rank-stepped DP vectorized
    ACROSS every key of a bucket. Sequential DP is not SQL-expressible
    (rows-only; pytest pins a scalar reference implementation).

    Returns one row per key: (key, frechet_d2:int64, n_points)."""
    import ray

    from ..blocks import group_by_key_bucket

    rx = np.ascontiguousarray(ref_xy[:, 0], dtype=np.int64)
    ry = np.ascontiguousarray(ref_xy[:, 1], dtype=np.int64)
    ref = ray.put((rx, ry))
    m = len(rx)
    BIG = np.int64(1) << 60

    def pre(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch[key_col],
                         "ts": batch[ts_col].cast(pa.timestamp("us"))
                         .cast(pa.int64()),
                         "t": batch[tie_col],
                         "x": batch[x_col], "y": batch[y_col]})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "frechet_d2": pa.array([], type=pa.int64()),
                          "n_points": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or m == 0:
            return empty
        rxa, rya = ray.get(ref)
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((t, ts, k))
        k, x, y = k[o], x[o], y[o]
        n = len(k)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        nseg = np.diff(np.r_[starts, n])
        nk = len(starts)
        r = np.arange(n) - np.repeat(starts, nseg)
        state = np.full((nk, m), BIG)
        out = np.full(nk, BIG)
        maxr = int(nseg.max())
        seg_of = np.repeat(np.arange(nk), nseg)
        for step in range(maxr):
            idx = np.flatnonzero(r == step)
            if not len(idx):
                break
            ks = seg_of[idx]
            dx = x[idx, None] - rxa[None, :]
            dy = y[idx, None] - rya[None, :]
            d2 = dx * dx + dy * dy
            prev = state[ks]
            cur = np.empty_like(prev)
            if step == 0:
                # F(0, j) = max(F(0, j-1), d(0, j)) — running max
                cur[:, :] = np.maximum.accumulate(d2, axis=1)
            else:
                diag = np.empty_like(prev)
                diag[:, 0] = BIG
                diag[:, 1:] = prev[:, :-1]
                best = np.minimum(prev, diag)
                cur[:, 0] = np.maximum(prev[:, 0], d2[:, 0])
                for j in range(1, m):
                    b = np.minimum(best[:, j], cur[:, j - 1])
                    cur[:, j] = np.maximum(b, d2[:, j])
            np.minimum(cur, BIG, out=cur)
            state[ks] = cur
            ends = nseg[ks] - 1 == step
            if ends.any():
                out[ks[ends]] = cur[ends, m - 1]
        return pa.table({key_col: pa.array(k[starts]),
                         "frechet_d2": pa.array(out),
                         "n_points": pa.array(nseg.astype(np.int64))})

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, tie_col, x_col, y_col]))) \
        .map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def dbscan_labels(pairs, points, id_col: str = "event_id",
                  min_pts: int = 4):
    """DBSCAN (Ester et al. 1996, public algorithm) composed from the
    engine's scale primitives, given a precomputed within-radius pair
    table `pairs(a, b, ...)` (radius_join output — the eps-neighborhood
    graph) and the full point id set `points(id_col)`:

      * degree >= min_pts - 1 (neighbor count excluding self) marks
        CORE points;
      * connected components over core-core edges
        (stages/dedup.connected_components) label clusters, remapped to
        the NUMERIC component-min id;
      * BORDER points (non-core within radius of a core) take the MIN
        label among neighboring cores — a deterministic resolution of
        DBSCAN's order-dependent border tie;
      * everything else is NOISE (label -1).

    Scale shape: degree fold + two bucketed flag attaches on the pair
    table + components + three bucketed label attaches — every step a
    narrow bucketed shuffle; no driver-side graph beyond the declared
    connected_components driver_cap path. Degenerate inputs (no cores)
    short-circuit to all-noise without touching the empty-Dataset
    schema loss. Returns (id_col, label:int64, kind:string)."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..blocks import attach_lookup_bucketed
    from .dedup import connected_components

    def all_noise():
        def noise(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                id_col: batch[id_col].cast(pa.int64()),
                "label": pa.array(np.full(n, -1, dtype=np.int64)),
                "kind": pa.array(["noise"] * n, type=pa.string())})

        return points.map_batches(noise, batch_format="pyarrow")

    if pairs.count() == 0:
        return all_noise()

    def deg_partial(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        un, inv = np.unique(np.concatenate([a, b]),
                            return_inverse=True)
        return pa.table({id_col: pa.array(un.astype(np.int64)),
                         "deg": pa.array(np.bincount(inv)
                                         .astype(np.int64))})

    deg = pairs.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("deg", alias_name="deg"))
    core = deg.map_batches(
        lambda b: pa.table({
            id_col: b[id_col].cast(pa.int64()),
            "is_core": pa.array(
                (b["deg"].cast(pa.int64())
                 .to_numpy(zero_copy_only=False)
                 >= min_pts - 1).astype(np.int64))}),
        batch_format="pyarrow").materialize()

    flagged = attach_lookup_bucketed(
        attach_lookup_bucketed(pairs.select_columns(["a", "b"]), core,
                               "a", "is_core", "core_a",
                               lookup_key=id_col),
        core, "b", "is_core", "core_b",
        lookup_key=id_col).materialize()

    def core_edges(batch: pa.Table) -> pa.Table:
        ca = batch["core_a"].to_numpy(zero_copy_only=False)
        cb = batch["core_b"].to_numpy(zero_copy_only=False)
        keep = (ca == 1) & (cb == 1)
        return pa.table({
            "a": batch["a"].cast(pa.int64())
            .to_numpy(zero_copy_only=False)[keep],
            "b": batch["b"].cast(pa.int64())
            .to_numpy(zero_copy_only=False)[keep]})

    ce = flagged.map_batches(core_edges,
                             batch_format="pyarrow").materialize()
    if ce.count() == 0:
        # cores may still exist as singleton clusters only when they
        # have >= min_pts-1 non-core neighbors; with no core-core edge
        # a core is its own cluster labeled by itself
        cc_rows = None
    else:
        cc_rows = connected_components(ce, a_col="a", b_col="b")

    # label table for CORES: component numeric-min, or self for
    # isolated cores (cores absent from any core-core edge)
    if cc_rows is not None:
        def to_int(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_col: pa.array(
                    [int(v) for v in batch["image_id"].to_pylist()],
                    type=pa.int64()),
                "rep_s": batch["rep"].cast(pa.string())})

        cci = cc_rows.map_batches(to_int,
                                  batch_format="pyarrow").materialize()
        repmin = cci.groupby("rep_s").aggregate(
            Min(id_col, alias_name="label"))
        in_cc = attach_lookup_bucketed(cci, repmin, "rep_s", "label",
                                       "label") \
            .select_columns([id_col, "label"])
    else:
        in_cc = None

    import pyarrow.compute as _pc
    core_only = core.map_batches(
        lambda b: b.filter(_pc.equal(b["is_core"], 1))
        .select([id_col]), batch_format="pyarrow")
    if in_cc is not None:
        lab = attach_lookup_bucketed(core_only, in_cc, id_col, "label",
                                     "label")
        core_lab = lab.map_batches(
            lambda b: pa.table({
                id_col: b[id_col].cast(pa.int64()),
                "label": pa.array(np.asarray(
                    [int(v) if v is not None else int(e)
                     for v, e in zip(b["label"].to_pylist(),
                                     b[id_col].to_pylist())],
                    dtype=np.int64))}),
            batch_format="pyarrow").materialize()
    else:
        core_lab = core_only.map_batches(
            lambda b: pa.table({
                id_col: b[id_col].cast(pa.int64()),
                "label": b[id_col].cast(pa.int64())}),
            batch_format="pyarrow").materialize()
    if core_lab.count() == 0:
        return all_noise()

    def border_cand(batch: pa.Table) -> pa.Table:
        a = batch["a"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = batch["b"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ca = batch["core_a"].to_numpy(zero_copy_only=False)
        cb = batch["core_b"].to_numpy(zero_copy_only=False)
        m1 = (ca != 1) & (cb == 1)
        m2 = (cb != 1) & (ca == 1)
        return pa.table({
            "pt": pa.array(np.concatenate([a[m1], b[m2]])),
            "core_nb": pa.array(np.concatenate([b[m1], a[m2]]))})

    border = attach_lookup_bucketed(
        flagged.map_batches(border_cand, batch_format="pyarrow"),
        core_lab, "core_nb", "label", "label",
        lookup_key=id_col) \
        .groupby("pt").aggregate(Min("label", alias_name="label")) \
        .materialize()

    lab1 = attach_lookup_bucketed(points, core_lab, id_col, "label",
                                  "core_label")
    if border.count() > 0:
        lab2 = attach_lookup_bucketed(lab1, border, id_col, "label",
                                      "border_label", lookup_key="pt")
    else:
        lab2 = lab1.map_batches(
            lambda b: b.append_column(
                "border_label",
                pa.array([None] * b.num_rows, type=pa.int64())),
            batch_format="pyarrow")

    def fin(batch: pa.Table) -> pa.Table:
        eid = batch[id_col].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cl = batch["core_label"].to_pylist()
        bl = batch["border_label"].to_pylist()
        is_core = np.asarray([v is not None for v in cl])
        is_border = np.asarray([v is not None for v in bl]) & ~is_core
        label = np.full(len(eid), -1, dtype=np.int64)
        if is_core.any():
            label[is_core] = np.asarray(
                [int(v) for v in cl if v is not None], dtype=np.int64)
        if is_border.any():
            label[is_border] = np.asarray(
                [int(b) for b, c in zip(bl, cl)
                 if b is not None and c is None], dtype=np.int64)
        kind = np.where(is_core, "core",
                        np.where(is_border, "border", "noise"))
        return pa.table({id_col: pa.array(eid),
                         "label": pa.array(label),
                         "kind": pa.array(kind.tolist(),
                                          type=pa.string())})

    return lab2.map_batches(fin, batch_format="pyarrow")
