"""Tile assignment with salted-skew handling — the groupby-on-cell shuffle
of the north rule ("skewed cells split by salted sub-cell keys before
aggregation").

Pattern: a cheap pre-aggregation pass counts rows per cell (partial counts
per batch -> tiny groupby); cells above `hot_threshold` get their rows
salted into `cell#salt` sub-keys so no single reducer receives a whole
urban cell; per-salt partial aggregates are then re-merged in a second,
tiny groupby. Aggregates here must be commutative-mergeable (counts, sums,
min/max, mergeable sketches)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.cells import cell_encode
from ..functions.hashing import hash_str_u64


def cell_counts(ds, level: int, lon_col: str = "lon", lat_col: str = "lat"):
    """Per-cell row counts with per-batch partial combine before the shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cells = cell_encode(batch[lon_col].to_numpy(zero_copy_only=False),
                            batch[lat_col].to_numpy(zero_copy_only=False), level)
        uc, cnt = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(uc.view(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("n", alias_name="n_images"))


def salted_counts(ds, level: int, hot_threshold: int = 100_000, salts: int = 16,
                  lon_col: str = "lon", lat_col: str = "lat",
                  id_col: str = "image_id"):
    """Per-cell counts through the salted two-stage shuffle using NATIVE
    aggregates end-to-end (no per-group Python): hot cells split into
    cell#salt sub-keys, per-(cell,salt) Count, then per-cell Sum re-merge.
    Same result as cell_counts; this is the skew-safe path for aggregates
    that must see raw rows grouped (counts here stand in for them)."""
    import ray
    from ray.data.aggregate import Count, Sum

    hot = cell_counts(ds, level, lon_col, lat_col)
    hot_rows = hot.filter(expr=f"n_images > {hot_threshold}").take_all()
    hot_ref = ray.put(np.sort(np.asarray([r["cell"] for r in hot_rows],
                                         dtype=np.int64)))

    def add_key(batch: pa.Table) -> pa.Table:
        hotset = ray.get(hot_ref)
        cells = cell_encode(batch[lon_col].to_numpy(zero_copy_only=False),
                            batch[lat_col].to_numpy(zero_copy_only=False),
                            level).view(np.int64)
        salt = np.zeros(len(cells), dtype=np.int32)
        if hotset.size:
            pos = np.searchsorted(hotset, cells)
            pos[pos == len(hotset)] = len(hotset) - 1
            is_hot = hotset[pos] == cells
            if is_hot.any():
                h = hash_str_u64(batch[id_col].cast(pa.string()))
                salt[is_hot] = (h[is_hot] % np.uint64(salts)).astype(np.int32)
        return pa.table({"cell": pa.array(cells), "salt": pa.array(salt)})

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    partials = keyed.groupby(["cell", "salt"]).aggregate(Count(alias_name="n"))
    return partials.groupby("cell").aggregate(Sum("n", alias_name="n_images"))


def cell_top_key(ds, level: int, key_col: str,
                 lon_col: str = "lon", lat_col: str = "lat",
                 buckets: int | None = None):
    """Dominant key per grid cell — the modal tag/class of every tile
    (the raster "majority class" layer; reference relative: tags-count's
    grouped key counting, /root/reference/src/command_tags_count.cpp:270-315,
    projected onto extract's spatial grid).

    Scale shape: in-batch partial counts of (cell, key) collapse each
    block to its distinct pairs BEFORE any exchange, then ONE
    hash(cell)%buckets shuffle; inside a bucket a vectorized lexsort +
    run-length fold finishes the sums and picks each cell's argmax with
    deterministic tiebreak (count desc, key asc — first-max over
    key-ascending runs). No per-cell Python, no second shuffle.

    Returns (cell_x:int64, cell_y:int64, key, cnt:int64)."""
    import ray

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    n = np.int64(1) << np.int64(level)

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(x, 0, n - 1, out=x)
        np.clip(y, 0, n - 1, out=y)
        cell = (x << np.int64(32)) | y
        keys = np.asarray(batch[key_col].to_pylist(), dtype="U")
        order = np.lexsort((keys, cell))
        cc, kc = cell[order], keys[order]
        new = np.ones(len(cc), dtype=bool)
        new[1:] = (cc[1:] != cc[:-1]) | (kc[1:] != kc[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(cc)))
        return pa.table({
            "_b": pa.array((cc[starts] % buckets).astype(np.int32)),
            "_cell": pa.array(cc[starts]),
            key_col: pa.array(kc[starts].tolist(), type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"cell_x": pa.array([], type=pa.int64()),
                          "cell_y": pa.array([], type=pa.int64()),
                          key_col: pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        cell = g["_cell"].to_numpy(zero_copy_only=False)
        keys = np.asarray(g[key_col].to_pylist(), dtype="U")
        nn = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, cell))
        cc, kc, ns = cell[order], keys[order], nn[order]
        new = np.ones(len(cc), dtype=bool)
        new[1:] = (cc[1:] != cc[:-1]) | (kc[1:] != kc[:-1])
        pstarts = np.flatnonzero(new)
        sums = np.add.reduceat(ns, pstarts)
        cell2, key2 = cc[pstarts], kc[pstarts]
        cnew = np.ones(len(cell2), dtype=bool)
        cnew[1:] = cell2[1:] != cell2[:-1]
        cstarts = np.flatnonzero(cnew)
        lens = np.diff(np.append(cstarts, len(cell2)))
        maxn = np.maximum.reduceat(sums, cstarts)
        ismax = np.flatnonzero(sums == np.repeat(maxn, lens))
        pick = ismax[np.searchsorted(ismax, cstarts)]
        return pa.table({
            "cell_x": pa.array(cell2[pick] >> np.int64(32)),
            "cell_y": pa.array(cell2[pick] & np.int64(0xFFFFFFFF)),
            key_col: pa.array(key2[pick].tolist(), type=pa.string()),
            "cnt": pa.array(sums[pick].astype(np.int64)),
        })

    return ds.select_columns([lon_col, lat_col, key_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def assign_tiles_salted(ds, level: int, agg_fn, hot_threshold: int = 100_000,
                        salts: int = 16, lon_col: str = "lon", lat_col: str = "lat",
                        id_col: str = "image_id"):
    """Grouped per-tile aggregation that never funnels a hot cell through
    one reducer.

    agg_fn: pandas per-group function returning ONE partial-aggregate row
    per (possibly salted) group; partials for the same cell are summed
    column-wise — agg_fn output must therefore be mergeable rows
    (counts/sums columns). Returns the per-cell merged Dataset.

    Shape: both stages run through group_by_key_bucket (blocks.py) —
    hash-bucket shuffles whose per-call Python cost is O(buckets), not
    O(cells): stage 1 buckets by (cell, salt) and runs agg_fn via an
    in-bucket pandas groupby (the user fn is a black box, so the
    per-group call survives, but without Ray's ~5 ms per-group
    map_groups overhead); stage 2 merges the tiny partials with a fully
    vectorized per-bucket groupby-sum."""
    import ray

    from ..blocks import group_by_key_bucket

    hot = cell_counts(ds, level, lon_col, lat_col)
    hot_rows = hot.filter(expr=f"n_images > {hot_threshold}").take_all()
    hot_cells = np.asarray([r["cell"] for r in hot_rows], dtype=np.int64)
    hot_ref = ray.put(np.sort(hot_cells))

    def add_key(batch: pa.Table) -> pa.Table:
        hotset = ray.get(hot_ref)
        cells = cell_encode(batch[lon_col].to_numpy(zero_copy_only=False),
                            batch[lat_col].to_numpy(zero_copy_only=False), level) \
            .view(np.int64)
        salt = np.zeros(len(cells), dtype=np.int32)
        if hotset.size:
            pos = np.searchsorted(hotset, cells)
            pos[pos == len(hotset)] = len(hotset) - 1
            is_hot = hotset[pos] == cells
            if is_hot.any():
                ids = batch[id_col]
                h = hash_str_u64(ids.cast(pa.string()))
                salt[is_hot] = (h[is_hot] % np.uint64(salts)).astype(np.int32)
        batch = batch.append_column("cell", pa.array(cells))
        return batch.append_column("salt", pa.array(salt))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")

    def fold_partials(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame()
        outs = [agg_fn(sub)
                for _, sub in g.groupby(["cell", "salt"], sort=False)]
        return pd.concat(outs, ignore_index=True)

    partials = group_by_key_bucket(keyed, ["cell", "salt"], fold_partials,
                                   batch_format="pandas")

    def merge_fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame()
        num = g.select_dtypes("number").drop(columns=["salt"],
                                             errors="ignore")
        cols = [c for c in num.columns if c != "cell"]
        return num.groupby("cell", as_index=False, sort=False)[cols].sum()

    return group_by_key_bucket(partials, "cell", merge_fold,
                               batch_format="pandas")


def tile_pyramid(points, max_level: int, lon_col: str = "lon",
                 lat_col: str = "lat"):
    """Full tile pyramid: point counts at every zoom level from
    `max_level` down to 0 — the hierarchical aggregation a map-tile
    (or any drill-down dashboard) build runs. The in-batch pre-agg on
    the finest grid explodes each sparse (cell, n) row into its
    max_level+1 ancestors IN THE SAME map task (floor(x / 2^k)
    composes with floor(v * 2^L), so an ancestor fold equals a direct
    aggregation at that level — the SQL twin), then ONE native Sum
    groupby over (level << 60 | morton-packed cell) keys builds every
    zoom level in a single shuffle — a per-level shuffle chain measured
    ~7x slower wall at sf0.1.

    Returns (level:int64, cell_x:int64, cell_y:int64, n:int64)."""
    from ray.data.aggregate import Sum

    n = np.int64(1) << np.int64(max_level)

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
        # ancestor explode: level L cell = finest >> (max_level - L),
        # tagged into one int64 key (26 bits per axis at level<=26)
        ks, ns = [], []
        for level in range(max_level, -1, -1):
            sh = np.int64(max_level - level)
            lk = (np.int64(level) << np.int64(58)) \
                | ((ux >> sh) << np.int64(29)) | (uy >> sh)
            fk, inv = np.unique(lk, return_inverse=True)
            ks.append(fk)
            ns.append(np.bincount(inv, weights=cnt).astype(np.int64))
        return pa.table({"_k": pa.array(np.concatenate(ks)),
                         "n": pa.array(np.concatenate(ns))})

    agg = points.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("n", alias_name="n"))

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch["_k"].to_numpy(zero_copy_only=False)
        return pa.table({
            "level": pa.array(k >> np.int64(58)),
            "cell_x": pa.array((k >> np.int64(29))
                               & np.int64((1 << 29) - 1)),
            "cell_y": pa.array(k & np.int64((1 << 29) - 1)),
            "n": batch["n"].cast(pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def hotspot_tiles(points, level: int, z: int = 2,
                  lon_col: str = "lon", lat_col: str = "lat"):
    """Spatial hotspot detection: tiles whose point count exceeds
    mean + z * stddev of the tile-count distribution (the z-score
    hotspot rule GIS dashboards run on density grids). The comparison
    is INTEGER-exact — n > mu + z*sd is evaluated as
    (n*N - S)^2 > z^2 * (N*Q - S^2) with n*N > S, where N/S/Q are the
    tile count / sum / sum-of-squares — so no float stddev formula
    (Welford vs two-pass) can flip a boundary tile between engines.

    ONE corpus shuffle builds the sparse counts; N/S/Q fold through a
    native Sum over three scalar partial columns (constant-size driver
    traffic); the threshold filter is map-side with broadcast scalars.
    Returns (cell_x, cell_y, n_images:int64) for hotspot tiles only."""
    import ray
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

    counts = points.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("n", alias_name="n")).materialize()

    def moments(batch: pa.Table) -> pa.Table:
        v = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"_m": pa.array([0, 1, 2], type=pa.int64()),
                         "s": pa.array([len(v), int(v.sum()),
                                        int((v * v).sum())],
                                       type=pa.int64())})

    folded = counts.map_batches(moments, batch_format="pyarrow") \
        .groupby("_m").aggregate(Sum("s", alias_name="s")).take_all()
    sc = {int(r["_m"]): int(r["s"]) for r in folded}
    N, S, Q = sc.get(0, 0), sc.get(1, 0), sc.get(2, 0)
    ref = ray.put((N, S, Q, z * z))

    def threshold(batch: pa.Table) -> pa.Table:
        Nn, Ss, Qq, z2 = ray.get(ref)
        k = batch["_k"].to_numpy(zero_copy_only=False)
        v = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = v * Nn - Ss
        keep = (d > 0) & (d * d > z2 * (Nn * Qq - Ss * Ss))
        return pa.table({
            "cell_x": pa.array((k >> np.int64(32))[keep]),
            "cell_y": pa.array((k & np.int64(0xFFFFFFFF))[keep]),
            "n_images": pa.array(v[keep]),
        })

    return counts.map_batches(threshold, batch_format="pyarrow")


def adaptive_quadtree(points, levels: tuple[int, int, int],
                      threshold: int,
                      lon_col: str = "lon", lat_col: str = "lat"):
    """Adaptive multi-resolution binning — the quadtree refinement a
    tile server uses to keep every emitted cell under a row budget:
    count at the coarse level, split any cell over `threshold` into its
    descendants at the next level, and again at the finest level (three
    levels, e.g. (4, 6, 8)). Returns (level, cell_x, cell_y, n) where
    every output cell is either under threshold or at max depth — the
    adaptive cousin of tile_pyramid's uniform rollup (reference
    relative: the zoom-level file splitting of man/osmium-export.md).

    Scale shape: points are read ONCE, pre-aggregated per batch at the
    FINEST level; coarser counts roll up from the finest aggregate by
    integer shifts (never re-reading points). The hot-cell sets that
    gate splitting are bounded by the GRID (<= 4^coarse cells), not the
    data, so their driver materialization is a constant (the
    salted_counts hot-set discipline)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    l0, l1, l2 = levels
    if not (l0 < l1 < l2):
        raise ValueError("levels must be strictly increasing")
    s01, s12 = l1 - l0, l2 - l1

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.cells import lonlat_to_xy

        x, y = lonlat_to_xy(
            batch[lon_col].to_numpy(zero_copy_only=False),
            batch[lat_col].to_numpy(zero_copy_only=False), l2)
        key = (x << 32) | y
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"cell_x": pa.array(uk >> 32),
                         "cell_y": pa.array(uk & 0xFFFFFFFF),
                         "n": pa.array(cnt.astype(np.int64))})

    c2 = points.map_batches(partial, batch_format="pyarrow") \
        .groupby(["cell_x", "cell_y"]) \
        .aggregate(Sum("n", alias_name="n")).materialize()

    def rollup(shift: int):
        def f(batch: pa.Table) -> pa.Table:
            x = batch["cell_x"].to_numpy(zero_copy_only=False)
            y = batch["cell_y"].to_numpy(zero_copy_only=False)
            n = batch["n"].to_numpy(zero_copy_only=False)
            key = ((x >> shift) << 32) | (y >> shift)
            uk = np.unique(key)
            pos = np.searchsorted(uk, key)
            tot = np.zeros(len(uk), dtype=np.int64)
            np.add.at(tot, pos, n)
            return pa.table({"cell_x": pa.array(uk >> 32),
                             "cell_y": pa.array(uk & 0xFFFFFFFF),
                             "n": pa.array(tot)})
        return f

    c1 = c2.map_batches(rollup(s12), batch_format="pyarrow") \
        .groupby(["cell_x", "cell_y"]) \
        .aggregate(Sum("n", alias_name="n")).materialize()
    c0 = c1.map_batches(rollup(s01), batch_format="pyarrow") \
        .groupby(["cell_x", "cell_y"]) \
        .aggregate(Sum("n", alias_name="n")).materialize()

    def hot_set(ds):
        rows = ds.take_all()        # bounded by the grid, not the data
        return {(int(r["cell_x"]), int(r["cell_y"])) for r in rows
                if r["n"] > threshold}

    hot0 = hot_set(c0)
    # hot level-1 cells only matter under a hot level-0 parent
    hot1 = {(x, y) for (x, y) in hot_set(c1)
            if (x >> s01, y >> s01) in hot0}

    def emit(level, pred):
        def f(batch: pa.Table) -> pa.Table:
            x = batch["cell_x"].to_numpy(zero_copy_only=False)
            y = batch["cell_y"].to_numpy(zero_copy_only=False)
            n = batch["n"].to_numpy(zero_copy_only=False)
            keep = pred(x, y, n)
            return pa.table({
                "level": pa.array(np.full(int(keep.sum()), level,
                                          dtype=np.int64)),
                "cell_x": pa.array(x[keep]),
                "cell_y": pa.array(y[keep]),
                "n": pa.array(n[keep])})
        return f

    def in_set(xs, ys, s):
        if not s:
            return np.zeros(len(xs), dtype=bool)
        arr = np.array(sorted((a << 32) | b for a, b in s),
                       dtype=np.int64)
        key = (xs << 32) | ys
        pos = np.searchsorted(arr, key)
        pos_c = np.minimum(pos, len(arr) - 1)
        return (pos < len(arr)) & (arr[pos_c] == key)

    f0 = c0.map_batches(
        emit(l0, lambda x, y, n: n <= threshold),
        batch_format="pyarrow")
    f1 = c1.map_batches(
        emit(l1, lambda x, y, n: (n <= threshold)
             & in_set(x >> s01, y >> s01, hot0)),
        batch_format="pyarrow")
    f2 = c2.map_batches(
        emit(l2, lambda x, y, n: in_set(x >> s12, y >> s12, hot1)),
        batch_format="pyarrow")
    return f0.union(f1).union(f2)
