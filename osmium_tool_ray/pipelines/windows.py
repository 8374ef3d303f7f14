"""Windowed aggregates and as-of joins — temporal operators the reference
lacks but a training-data pipeline needs (build brief: "as-of join, range
join, windowed aggregate" as custom operators; closest reference
relatives are time-filter's per-id version windows,
/root/reference/src/command_time_filter.cpp:131-189, and apply-changes'
last-wins merge).

Scale shapes:
  * tumbling_window: window assignment is a stateless vectorized
    map_batches (integer floor on the epoch), then ONE native groupby
    aggregate over (window, keys) — partial+final combine, no skew
    beyond the keys themselves (salt hot keys upstream if needed).
  * asof_join: hash-partition both sides by key (one groupby shuffle of
    narrow projections), then a per-group vectorized searchsorted merge.
    Partitioning assumption: one key's rows fit in a group task (the
    same per-id assumption the reference's DiffIterator makes); for
    giant keys, range-bucket the timestamps and replicate each bucket's
    last right-side row into the next bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, ts_col: str, width_s: int,
                    out_col: str = "window"):
    """Assign each row the start (epoch seconds) of its tumbling window:
    floor(epoch / width) * width. Stateless vectorized stage."""
    def assign(batch: pa.Table) -> pa.Table:
        # cast via microseconds (a direct us->s cast raises on non-zero
        # sub-second parts); epoch_us stays exact in float64 up to 2^53
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        sec = pc.divide(us.cast(pa.float64()), 1e6)
        win = pc.multiply(
            pc.floor(pc.divide(sec, float(width_s))).cast(pa.int64()),
            width_s)
        return batch.append_column(out_col, win)

    return ds.map_batches(assign, batch_format="pyarrow")


def tumbling_window_aggregate(ds, ts_col: str, width_s: int,
                              key_cols: list[str], value_col: str):
    """Per-(window, keys) count + sum — the windowed-aggregate operator.
    One native groupby (map-side combine happens inside Ray's hash
    aggregate), never a per-row Python loop."""
    from ray.data.aggregate import Count, Sum

    win = tumbling_window(ds, ts_col, width_s)
    return win.groupby(["window", *key_cols]).aggregate(
        Count(alias_name="n"), Sum(value_col, alias_name="total"))


def sliding_window_aggregate(ds, ts_col: str, width_s: int, hop_s: int,
                             key_cols: list[str], value_col: str):
    """Hopping (sliding) windowed aggregate: windows of `width_s` seconds
    starting every `hop_s` (hop must divide width). Each row belongs to
    exactly width/hop windows; it is replicated into them map-side with
    np.repeat over a NARROW (window, keys, value) projection, then ONE
    native groupby aggregate runs — explode-then-aggregate, the same
    partial+final combine shape as the tumbling form, with shuffle volume
    k x rows of scalar columns (never the full payload)."""
    if width_s % hop_s:
        raise ValueError("hop_s must divide width_s")
    k = width_s // hop_s
    from ray.data.aggregate import Count, Sum

    key_cols = list(key_cols)

    def explode(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        sec = us.to_numpy(zero_copy_only=False).astype(np.float64) / 1e6
        base = (np.floor(sec / hop_s).astype(np.int64)
                * np.int64(hop_s))
        n = len(base)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        win = (np.repeat(base, k)
               - np.tile(np.arange(k, dtype=np.int64) * hop_s, n))
        cols = {"window": pa.array(win)}
        for c in key_cols + [value_col]:
            cols[c] = batch[c].take(idx)
        return pa.table(cols)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return exploded.groupby(["window", *key_cols]).aggregate(
        Count(alias_name="n"), Sum(value_col, alias_name="total"))


def sessionize(ds, key_col: str, ts_col: str, gap_s: int,
               out_col: str = "session"):
    """Gap-based sessionization: within each key, a new session starts
    whenever the time since the previous event exceeds `gap_s`. Session
    ids are 0-based per key (deterministic given the data, independent
    of partitioning).

    ONE hash(key)%buckets shuffle, then a multi-key vectorized pass per
    BUCKET: lexsort (key, ts), diff, segmented cumsum — the standard
    lag()+running-sum window translated to numpy, with Python overhead
    per partition instead of per distinct key (the group_by_key_bucket
    discipline). The output keeps the input columns plus the session
    id."""
    from ..blocks import group_by_key_bucket, strip_schema_metadata

    def per_group(g: pa.Table) -> pa.Table:
        g = strip_schema_metadata(g)
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], type=pa.int64()))
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        us = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # stable sort by (key, ts) so ties keep input order
        order = np.lexsort((us, keys.astype(str)))
        ks = keys[order]
        ts = us[order]
        new_key = np.concatenate([[True], ks[1:] != ks[:-1]])
        gap = np.concatenate([[False], (ts[1:] - ts[:-1]) >
                              gap_s * 1_000_000])
        breaks = (gap & ~new_key).astype(np.int64)
        run = np.cumsum(breaks)
        # 0-based per key: subtract the running count at the key's first
        # row (forward-filled index of the last new_key position)
        first_idx = np.maximum.accumulate(
            np.where(new_key, np.arange(len(ks)), 0))
        session = run - run[first_idx]
        out = g.take(pa.array(order, type=pa.int64()))
        return out.append_column(out_col, pa.array(session))

    return group_by_key_bucket(ds, key_col, per_group)


def range_join(left, bands, value_col: str, lo_col: str = "lo",
               hi_col: str = "hi", band_cols: list[str] | None = None):
    """Range (band) join: attach to each left row the band whose
    [lo, hi) interval contains its value. The band table is broadcast
    (ray.put once, read per worker) and probed with ONE searchsorted per
    batch — no shuffle, no per-row Python. Assumes the bands are
    non-overlapping (the dimension-table case); rows outside every band
    get nulls."""
    import ray

    band_cols = band_cols or [c for c in bands.schema().names
                              if c not in (lo_col, hi_col)]
    rows = bands.take_all()
    lo = np.asarray([r[lo_col] for r in rows], dtype=np.float64)
    hi = np.asarray([r[hi_col] for r in rows], dtype=np.float64)
    order = np.argsort(lo, kind="stable")
    payload = {c: np.asarray([r[c] for r in rows], dtype=object)[order]
               for c in band_cols}
    ref = ray.put((lo[order], hi[order], payload))

    def probe(batch: pa.Table) -> pa.Table:
        slo, shi, pay = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(slo, v, side="right") - 1
        found = (idx >= 0) & (v < shi[np.maximum(idx, 0)]) if len(slo) \
            else np.zeros(len(v), dtype=bool)
        take = np.maximum(idx, 0)
        for c, vals in pay.items():
            col = np.where(found, vals[take], None) if len(slo) \
                else np.full(len(v), None, dtype=object)
            batch = batch.append_column(c, pa.array(col.tolist(),
                                                    type=pa.string()))
        return batch

    return left.map_batches(probe, batch_format="pyarrow")


def asof_join(left, right, key_col: str, ts_col: str,
              right_cols: list[str], suffix: str = "_r",
              direction: str = "backward"):
    """As-of join: for every left row, attach the right row with the
    LARGEST right.ts <= left.ts (direction="backward", DuckDB `ASOF LEFT
    JOIN ... ON l.k = r.k AND l.ts >= r.ts` semantics, inclusive) or the
    SMALLEST right.ts >= left.ts (direction="forward" — the
    next-event/lead lookup) for the same key. Unmatched left rows keep
    nulls.

    Both sides are tagged and unioned so ONE hash(key)%buckets shuffle
    co-locates each key; each BUCKET then lexsorts (key, ts, side) once
    and computes every left row's match with a single maximum/minimum
    .accumulate forward-fill over the sorted rows — no per-key Python at
    all (the group_by_key_bucket discipline), exact across any number of
    keys per bucket. At equal timestamps backward picks the last right
    row with rts <= lts and forward the first with rts >= lts, matching
    the searchsorted formulation bit-for-bit."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(lschema.names)
    # unified wide schema: left columns (left types) + right payload
    # columns (right types) + the side tag; either side fills the other's
    # columns with typed nulls so the union schemas match exactly
    wide_types = dict(ltypes)
    for c in right_cols:
        wide_types.setdefault(c, rtypes[c])
    all_cols = list(wide_types) + ["_side"]
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in lcols]
        + [(c + suffix, rtypes[c]) for c in right_cols])

    def widen(side: str):
        def f(batch: pa.Table) -> pa.Table:
            cols = {}
            for c in all_cols[:-1]:
                cols[c] = batch[c] if c in batch.schema.names \
                    else pa.nulls(batch.num_rows, type=wide_types[c])
            cols["_side"] = pa.array([side] * batch.num_rows)
            return pa.table(cols)
        return f

    def merge_bucket(g: pa.Table) -> pa.Table:
        # ONE lexsort of the whole bucket by (key, ts, side), then a
        # single accumulate pass forward-fills each left row's matching
        # right-row position; a filled position belonging to a DIFFERENT
        # key invalidates the match (keys are contiguous after the sort,
        # so the carried candidate can only be wrong at key boundaries)
        if g.num_rows == 0 or "_side" not in g.schema.names:
            return out_schema.empty_table()
        side = np.asarray(g["_side"].to_pylist(), dtype=object)
        is_left = side == "l"
        keys = np.asarray(g[key_col].to_pylist(), dtype=object) \
            .astype(str)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(ts)
        if direction == "backward":
            # right sorts before left at equal ts (rts <= lts inclusive);
            # max-accumulate carries the LAST right row at or before
            srank = np.where(is_left, 1, 0)
            order = np.lexsort((srank, ts, keys))
            ko, lo = keys[order], is_left[order]
            cand = np.where(~lo, np.arange(n), -1)
            fill = np.maximum.accumulate(cand)
            valid = fill >= 0
            fidx = np.maximum(fill, 0)
        else:
            # left sorts before right at equal ts (rts >= lts inclusive);
            # reversed min-accumulate carries the FIRST right row at or
            # after
            srank = np.where(is_left, 0, 1)
            order = np.lexsort((srank, ts, keys))
            ko, lo = keys[order], is_left[order]
            cand = np.where(~lo, np.arange(n), n)
            fill = np.minimum.accumulate(cand[::-1])[::-1]
            valid = fill < n
            fidx = np.minimum(fill, n - 1)
        valid &= ko[fidx] == ko
        lpos = np.flatnonzero(lo)
        if len(lpos) == 0:
            return out_schema.empty_table()
        found = pa.array(valid[lpos])
        lg = g.take(pa.array(order[lpos], type=pa.int64()))
        rg = g.take(pa.array(order[fidx[lpos]], type=pa.int64()))
        out_cols = {c: lg[c].combine_chunks() for c in lcols}
        for c in right_cols:
            vals = rg[c]
            vals = vals.combine_chunks() if isinstance(
                vals, pa.ChunkedArray) else vals
            out_cols[c + suffix] = pc.if_else(
                found, vals, pa.nulls(len(lpos), type=vals.type))
        return pa.table(out_cols, schema=out_schema)

    from ..blocks import group_by_key_bucket

    lt = left.map_batches(widen("l"), batch_format="pyarrow")
    rt = right.select_columns(
        list(dict.fromkeys([key_col, ts_col, *right_cols]))) \
        .map_batches(widen("r"), batch_format="pyarrow")
    return group_by_key_bucket(lt.union(rt), key_col, merge_bucket)


def running_total(ds, order_cols: list[str], value_col: str,
                  out_col: str = "running_total", key_col: str | None = None):
    """Distributed prefix scan: SUM(value) OVER ([PARTITION BY key]
    ORDER BY order_cols ROWS UNBOUNDED PRECEDING).

    key_col given — ONE hash(key)%buckets shuffle, then each BUCKET
    lexsorts (key, order_cols) and runs a SEGMENTED cumsum (global
    cumsum minus each key's base — exact for sums), so Python overhead
    is per partition, not per distinct key (the group_by_key_bucket
    discipline; per-key group sizes stay bounded as sessionize
    documents).

    key_col None — the GLOBAL scan: distributed sort by order_cols,
    per-block sequential cumsum, then an exclusive scan of per-block
    totals on the driver (scalars only — blocks x 8 bytes) is added
    back as each block's offset. Strictly left-to-right addition order,
    so integer totals match a sequential engine bit-for-bit.
    """
    import ray

    order_cols = list(order_cols)

    if key_col is not None:
        from ..blocks import group_by_key_bucket, strip_schema_metadata

        def per_bucket(g: pa.Table) -> pa.Table:
            g = strip_schema_metadata(g)
            if g.num_rows == 0:
                return g.append_column(
                    out_col, pa.array([], type=pa.int64()))
            keys = np.asarray(g[key_col].to_pylist(), dtype=object) \
                .astype(str)
            idx = np.lexsort(tuple(
                g[c].to_numpy(zero_copy_only=False)
                for c in reversed(order_cols)) + (keys,))
            g = g.take(pa.array(idx))
            ks = keys[idx]
            v = g[value_col].to_numpy(zero_copy_only=False)
            total = np.cumsum(v)
            new = np.ones(len(ks), dtype=bool)
            new[1:] = ks[1:] != ks[:-1]
            starts = np.flatnonzero(new)
            lens = np.diff(np.append(starts, len(ks)))
            base = np.repeat(total[starts] - v[starts], lens)
            return g.append_column(out_col, pa.array(total - base))

        return group_by_key_bucket(ds, key_col, per_bucket)

    from ..blocks import _remote_num_rows

    sorted_ds = ds.sort(order_cols).materialize()
    refs = sorted_ds.to_arrow_refs()
    nrows = ray.get([_remote_num_rows.remote(r) for r in refs])
    refs = [r for r, n in zip(refs, nrows) if n]   # schema-less empty blocks

    @ray.remote(num_cpus=0)
    def block_total(tbl: pa.Table):
        if value_col not in tbl.schema.names or tbl.num_rows == 0:
            return 0
        v = tbl[value_col].to_numpy(zero_copy_only=False)
        return np.cumsum(v)[-1]          # sequential within-block order

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = []
    acc = 0
    for t in totals:                     # sequential across blocks too
        offsets.append(acc)
        acc = acc + t

    @ray.remote(num_cpus=0)
    def scan_block(tbl: pa.Table, off):
        if tbl.num_rows == 0:
            return tbl
        run = np.cumsum(tbl[value_col].to_numpy(zero_copy_only=False)) + off
        return tbl.append_column(out_col, pa.array(run))

    import ray.data as rd

    out_refs = [scan_block.remote(r, o) for r, o in zip(refs, offsets)]
    if not out_refs:
        return sorted_ds
    return rd.from_arrow_refs(out_refs)


def pack_bins(ds, order_cols: list[str], size_col: str, budget: int,
              bin_col: str = "bin", offset_col: str = "offset"):
    """Sequence packing — assign each row its (bin, byte offset) under
    contiguous concatenation in `order_cols` order with fixed `budget`
    per bin (how LLM training data is packed into fixed-length windows;
    rows may straddle bins, exactly like token streams do).

    Pure composition over the distributed prefix scan (running_total):
    bin = prev_cum // budget, offset = prev_cum % budget, where prev_cum
    is the EXCLUSIVE running total of `size_col`. Deterministic, one
    sort, integer-exact vs the SQL window oracle."""
    rt = running_total(ds, order_cols, size_col, out_col="_rt")

    def fin(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "_rt" not in batch.schema.names:
            return batch
        run = batch["_rt"].to_numpy(zero_copy_only=False)
        size = batch[size_col].to_numpy(zero_copy_only=False)
        start = run - size
        batch = batch.drop_columns(["_rt"])
        return batch.append_column(bin_col,
                                   pa.array(start // budget)) \
                    .append_column(offset_col, pa.array(start % budget))

    return rt.map_batches(fin, batch_format="pyarrow")


def track_length(ds, key_col: str, ts_col: str, x_col: str, y_col: str,
                 tie_col: str | None = None):
    """Per-key track length — total L1 distance over the key's points in
    timestamp order (GPS-track mileage per user, in fixed-point units
    when x/y are int64 fixed coords so the distributed sum is exact).

    ONE hash(key)%buckets shuffle of the narrow (key, ts, x, y)
    projection, then a multi-key vectorized lexsort + diff + masked
    reduceat fold per bucket (the track_sectors shape — Python overhead
    per partition, not per key). Ties in ts break on `tie_col` for
    determinism. Returns (key, n_points:int64, track_fix:int64)."""
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key_col not in g.schema.names:
            return pa.table({key_col: pa.array([], type=key_type),
                             "n_points": pa.array([], type=pa.int64()),
                             "track_fix": pa.array([], type=pa.int64())})
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        x = g[x_col].to_numpy(zero_copy_only=False)
        y = g[y_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys.astype(str)))
        ks, xs, ys = keys[order], x[order], y[order]
        same = np.concatenate([[False], ks[1:] == ks[:-1]])
        step = (np.abs(np.diff(xs, prepend=xs[:1]))
                + np.abs(np.diff(ys, prepend=ys[:1]))) * same
        # per-key fold: boundaries of key runs
        starts = np.flatnonzero(~same)
        ends = np.concatenate([starts[1:], [len(ks)]])
        tot = np.add.reduceat(step, starts)
        return pa.table({
            key_col: pa.array(ks[starts].tolist(),
                              type=g.schema.field(key_col).type),
            "n_points": pa.array((ends - starts).astype(np.int64)),
            "track_fix": pa.array(tot.astype(np.int64)),
        })

    from ..blocks import group_by_key_bucket

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, x_col, y_col]
                           + ([tie_col] if tie_col else []))))
    return group_by_key_bucket(narrow, key_col, per_group)


_SECTOR_COLS = ("n_e", "n_ne", "n_n", "n_nw",
                "n_w", "n_sw", "n_s", "n_se", "n_still")


def track_sectors(ds, key_col: str, ts_col: str, x_col: str, y_col: str,
                  tie_col: str | None = None, buckets: int | None = None):
    """Per-key compass-sector histogram over track segments — the
    heading-distribution profile of each GPS track (reference relative:
    osmium's per-object track ordering in sort/time-filter; the heading
    rose is the training-side motion-analytics companion).

    Integer-exact classification, no atan2 (keeps the distributed result
    bit-identical to the SQL CASE oracle): for a segment (dx, dy),
      cardinal  E/W when |dx| >  |dy| (sign of dx),
      cardinal  N/S when |dy| >  |dx| (sign of dy),
      diagonal  NE/SE/NW/SW when |dx| == |dy| != 0 (signs of both),
      still     when dx == dy == 0.

    Scale shape: ONE hash shuffle of the narrow (key, ts, x, y)
    projection into hash(key)%buckets groups, then a vectorized lexsort
    + diff + masked reduceat fold per bucket (the track_simplify
    bucketed form — per-key map_groups pays ~5 ms per tiny group).
    Returns (key, n_segs, n_e, n_ne, n_n, n_nw, n_w, n_sw, n_s, n_se,
    n_still), all counts int64."""
    from ..functions.hashing import hash_str_u64

    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    cols = list(dict.fromkeys([key_col, ts_col, x_col, y_col]
                              + ([tie_col] if tie_col else [])))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        key_type = g.schema.field(key_col).type
        if g.num_rows == 0:
            cols_out = {key_col: pa.array([], type=key_type),
                        "n_segs": pa.array([], type=pa.int64())}
            for c in _SECTOR_COLS:
                cols_out[c] = pa.array([], type=pa.int64())
            return pa.table(cols_out)
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        x = g[x_col].to_numpy(zero_copy_only=False)
        y = g[y_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, keys.astype(str)))
        ks = keys[order]
        xs, ys = x[order], y[order]
        same = np.concatenate([[False], ks[1:] == ks[:-1]])
        dx = np.diff(xs, prepend=xs[:1])
        dy = np.diff(ys, prepend=ys[:1])
        adx, ady = np.abs(dx), np.abs(dy)
        masks = (
            (adx > ady) & (dx > 0),                       # E
            (adx == ady) & (dx > 0) & (dy > 0),           # NE
            (ady > adx) & (dy > 0),                       # N
            (adx == ady) & (dx < 0) & (dy > 0),           # NW
            (adx > ady) & (dx < 0),                       # W
            (adx == ady) & (dx < 0) & (dy < 0),           # SW
            (ady > adx) & (dy < 0),                       # S
            (adx == ady) & (dx > 0) & (dy < 0),           # SE
            (dx == 0) & (dy == 0),                        # still
        )
        starts = np.flatnonzero(~same)
        ends = np.concatenate([starts[1:], [len(ks)]])
        out = {key_col: pa.array(ks[starts].tolist(), type=key_type),
               "n_segs": pa.array((ends - starts - 1).astype(np.int64))}
        for name, m in zip(_SECTOR_COLS, masks):
            per = np.add.reduceat((m & same).astype(np.int64), starts)
            out[name] = pa.array(per)
        return pa.table(out)

    return ds.select_columns(cols) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def turn_counts_per_key(ds, key_col: str, ts_col: str, x_col: str,
                        y_col: str, tie_col: str | None = None,
                        buckets: int | None = None):
    """Per-key turning-direction histogram over consecutive track
    triples: left / right / straight by the SIGN of the integer cross
    product (x1-x0)(y2-y1) - (y1-y0)(x2-x1) — no angles, no floats, so
    the distributed result is bit-identical to the SQL double-LAG CASE
    oracle (the track_sectors discipline applied to curvature).
    Coordinate deltas must satisfy |dx|*|dy| < 2^62 (pre-scale
    fixed-point inputs down — they are exact multiples).

    Scale shape: ONE hash(key)%buckets shuffle of the narrow projection,
    then a vectorized lexsort + double-shift diff + masked bincount fold
    per bucket. Returns (key, n_triples, n_left, n_right, n_straight),
    counts int64."""
    from ..functions.hashing import hash_str_u64

    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    cols = list(dict.fromkeys([key_col, ts_col, x_col, y_col]
                              + ([tie_col] if tie_col else [])))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        key_type = g.schema.field(key_col).type
        empty = pa.table({key_col: pa.array([], type=key_type),
                          "n_triples": pa.array([], type=pa.int64()),
                          "n_left": pa.array([], type=pa.int64()),
                          "n_right": pa.array([], type=pa.int64()),
                          "n_straight": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tie, ts, keys.astype(str)))
        ks = keys[order]
        xs, ys = x[order], y[order]
        n = len(ks)
        # a triple at position i uses rows i-2, i-1, i — valid when all
        # three share the key
        same1 = np.concatenate([[False], ks[1:] == ks[:-1]])
        same2 = np.concatenate([[False, False], ks[2:] == ks[:-2]])
        valid = same1 & same2
        dx1 = np.concatenate([[0, 0], xs[1:-1] - xs[:-2]])
        dy1 = np.concatenate([[0, 0], ys[1:-1] - ys[:-2]])
        dx2 = np.concatenate([[0, 0], xs[2:] - xs[1:-1]])
        dy2 = np.concatenate([[0, 0], ys[2:] - ys[1:-1]])
        cross = dx1 * dy2 - dy1 * dx2
        starts = np.flatnonzero(np.concatenate(
            [[True], ks[1:] != ks[:-1]]))
        def fold(m):
            return np.add.reduceat((m & valid).astype(np.int64), starts)
        left = fold(cross > 0)
        right = fold(cross < 0)
        straight = fold(cross == 0)
        return pa.table({
            key_col: pa.array(ks[starts].tolist(), type=key_type),
            "n_triples": pa.array(left + right + straight),
            "n_left": pa.array(left), "n_right": pa.array(right),
            "n_straight": pa.array(straight)})

    return ds.select_columns(cols) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def _dp_keep(xs: np.ndarray, ys: np.ndarray, eps2: float) -> np.ndarray:
    """Douglas-Peucker keep-mask over one polyline (iterative stack, no
    recursion; distances vectorized per segment). Squared perpendicular
    distance in float64 — deterministic IEEE everywhere; first-max
    argmax breaks ties."""
    m = len(xs)
    keep = np.zeros(m, dtype=bool)
    keep[0] = keep[-1] = True
    if m < 3:
        return keep
    stack = [(0, m - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        dx, dy = xs[j] - xs[i], ys[j] - ys[i]
        px = xs[i + 1:j] - xs[i]
        py = ys[i + 1:j] - ys[i]
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = px * px + py * py
        else:
            cross = px * dy - py * dx
            d2 = cross * cross / seg2
        k = int(np.argmax(d2))
        if d2[k] > eps2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def track_simplify(ds, key_col: str, ts_col: str, x_col: str, y_col: str,
                   epsilon: float, tie_col: str | None = None,
                   buckets: int | None = None):
    """Per-key Douglas-Peucker polyline simplification — the classic
    GPS-track thinning pass (keep every point farther than `epsilon`
    from the kept chord; endpoints always survive). The reference draws
    full geometries (export's linestring assembly); simplification is
    the training/serving-side companion op.

    Scale shape: ONE hash shuffle of the narrow (key, ts, x, y)
    projection into hash(key)%buckets groups (per-key map_groups at
    millions of tiny tracks pays ~5 ms pandas overhead per group — the
    bucketed segmented form is the in-repo pattern); inside a bucket
    keys are lexsorted and each track runs the iterative stack DP with
    per-segment vectorized distances. Track size is naturally bounded
    (points per user), so no hot-cell cap is needed.

    Returns kept points (key, ts, x, y, pt_idx:int64 position in the
    ts-ordered track)."""
    from ..functions.hashing import hash_str_u64

    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    eps2 = float(epsilon) * float(epsilon)

    cols = list(dict.fromkeys([key_col, ts_col, x_col, y_col]
                              + ([tie_col] if tie_col else [])))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        key_type = g.schema.field(key_col).type
        empty = pa.table({key_col: pa.array([], type=key_type),
                          ts_col: pa.array([], type=g.schema
                                           .field(ts_col).type),
                          x_col: pa.array([], type=g.schema
                                          .field(x_col).type),
                          y_col: pa.array([], type=g.schema
                                          .field(y_col).type),
                          "pt_idx": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((tie, ts, keys.astype(str)))
        ks = keys[order]
        xs, ys = x[order], y[order]
        same = np.concatenate([[False], ks[1:] == ks[:-1]])
        starts = np.flatnonzero(~same)
        ends = np.concatenate([starts[1:], [len(ks)]])
        keep = np.zeros(len(ks), dtype=bool)
        for s, e in zip(starts, ends):
            keep[s:e] = _dp_keep(xs[s:e], ys[s:e], eps2)
        idx = order[keep]
        pt_idx = (np.arange(len(ks), dtype=np.int64)
                  - np.repeat(starts, ends - starts))[keep]
        return pa.table({
            key_col: g[key_col].take(pa.array(idx)),
            ts_col: g[ts_col].take(pa.array(idx)),
            x_col: g[x_col].take(pa.array(idx)),
            y_col: g[y_col].take(pa.array(idx)),
            "pt_idx": pa.array(pt_idx),
        })

    return ds.select_columns(cols) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def funnel_counts(ds, steps: list[str], user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  tie_col: str | None = None, buckets: int | None = None):
    """Ordered-funnel analysis: how many users complete step 1, then
    step 2 STRICTLY after it, then step 3 after that, ... (the
    view->click->purchase product-analytics staple; greedy earliest-
    match semantics — each step binds to its earliest qualifying
    event, which maximizes completions).

    Scale shape: ONE hash(user)%buckets shuffle of the narrow
    (user, ts, type) projection; inside a bucket users are lexsorted
    once and every funnel step is ONE vectorized masked
    minimum.reduceat over the user runs (k steps = k passes, no
    per-user Python). Buckets partition users, so per-bucket
    completion counts Sum to the global answer — the final fold is a
    len(steps)-row native aggregate.

    Returns (step:int64 1-based, event_type, n_users:int64)."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_str_u64

    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    INF = np.iinfo(np.int64).max

    cols = list(dict.fromkeys([user_col, ts_col, type_col]
                              + ([tie_col] if tie_col else [])))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[user_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"step": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or user_col not in g.schema.names:
            return empty
        users = np.asarray(g[user_col].to_pylist(), dtype=object) \
            .astype(str)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        types = g[type_col].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((tie, ts, users))
        us, tss, tys = users[order], ts[order], types[order]
        new = np.ones(len(us), dtype=bool)
        new[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(us)))
        t_prev = np.full(len(starts), np.iinfo(np.int64).min)
        reached = np.ones(len(starts), dtype=bool)
        out = []
        for k, s in enumerate(steps):
            eligible = ((tys == s)
                        & (tss > np.repeat(t_prev, lens))
                        & np.repeat(reached, lens))
            tcand = np.where(eligible, tss, INF)
            tmin = np.minimum.reduceat(tcand, starts)
            got = tmin < INF
            reached &= got
            t_prev = np.where(reached, tmin, t_prev)
            out.append(int(reached.sum()))
        return pa.table({"step": pa.array(np.arange(1, len(steps) + 1,
                                                    dtype=np.int64)),
                         "n": pa.array(np.asarray(out, dtype=np.int64))})

    folded = ds.select_columns(cols) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow") \
        .groupby("step").aggregate(Sum("n", alias_name="n_users"))

    name_of = {i + 1: s for i, s in enumerate(steps)}

    def label(batch: pa.Table) -> pa.Table:
        st = batch["step"].to_numpy(zero_copy_only=False)
        return pa.table({
            "step": batch["step"].cast(pa.int64()),
            type_col: pa.array([name_of[int(x)] for x in st],
                               type=pa.string()),
            "n_users": batch["n_users"].cast(pa.int64()),
        })

    return folded.map_batches(label, batch_format="pyarrow")


def window_dedup(ds, key_col: str, ts_col: str, width_s: int):
    """Windowed deduplication — keep each key's EARLIEST event per
    tumbling window (the rate-limiting / event-compaction pass stream
    pipelines run before fan-out; the time-windowed twin of exact
    dedup's keep-first); the survivor is identified by its timestamp
    (min-ts), so the result is partitioning-independent by construction.

    ONE native hash shuffle on (window, key) with an in-batch keep-first
    pre-prune (at most one row per (window, key) leaves each batch, so
    shuffle volume is bounded by distinct pairs, not raw events), then
    the same vectorized lexsort+run-length pick per group bucket.

    Returns the surviving rows (key, window:int64 epoch-seconds start,
    ts, tie if given) plus n_dropped per survivor."""
    from ray.data.aggregate import Min, Sum

    def prune(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        win = (us // (width_s * 1_000_000)) * width_s
        keys = np.asarray(batch[key_col].to_pylist(), dtype=object) \
            .astype(str)
        order = np.lexsort((us, win, keys))
        k, w = keys[order], win[order]
        first = np.ones(len(k), dtype=bool)
        first[1:] = (k[1:] != k[:-1]) | (w[1:] != w[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(k)))
        sel = order[first]
        return pa.table({
            key_col: batch[key_col].take(pa.array(sel)),
            "window": pa.array(w[first]),
            "_us": pa.array(us[order][first]),
            "_n": pa.array(cnt.astype(np.int64)),
        })

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    agg = pruned.groupby([key_col, "window"]).aggregate(
        Min("_us", alias_name="first_us"),
        Sum("_n", alias_name="n_events"))

    def finish(batch: pa.Table) -> pa.Table:
        ts = batch["first_us"].cast(pa.int64())
        return pa.table({
            key_col: batch[key_col],
            "window": batch["window"].cast(pa.int64()),
            "first_ts": ts.cast(pa.timestamp("us")),
            "n_events": batch["n_events"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def interval_coverage(ds, key_col: str, start_col: str, end_col: str,
                      buckets: int | None = None):
    """Gaps-and-islands interval union per key: merge every key's
    overlapping-or-touching [start, end) intervals and report how many
    merged islands remain plus the total covered span (the classic
    session-coverage / uptime operator; nearest reference relative is
    time-filter's per-id version windows,
    /root/reference/src/command_time_filter.cpp:131-189, which also
    reasons over [from, to) validity intervals per object).

    Scale shape: ONE hash(key)%buckets shuffle of the narrow
    (key, start, end) projection; inside a bucket the classic boundary
    sweep runs fully vectorized — each interval contributes a (+1 at
    start, -1 at end) delta, one lexsort orders boundaries per key
    (+1 before -1 at equal positions, so touching intervals merge), and
    the per-key active count is a SEGMENTED CUMSUM (global cumsum minus
    the value at each key's first boundary — exact for sums, unlike a
    segmented cummax, so the sweep formulation is the vectorizable
    one). Islands = positions where the active count rises from zero;
    covered = sum of inter-boundary gaps where active > 0. All int64,
    no per-key Python. Buckets partition keys, so each bucket emits
    FINAL per-key rows — no second fold.

    Returns (key, n_islands:int64, covered:int64)."""
    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        b = (k.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key_col not in g.schema.names:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "n_islands": pa.array([], type=pa.int64()),
                             "covered": pa.array([], type=pa.int64())})
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = g[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key2 = np.concatenate([k, k])
        pos = np.concatenate([s, e])
        delta = np.concatenate([np.ones(len(k), dtype=np.int64),
                                np.full(len(k), -1, dtype=np.int64)])
        # +1 before -1 at equal (key, pos): sort ascending on -delta
        order = np.lexsort((-delta, pos, key2))
        key2, pos, delta = key2[order], pos[order], delta[order]
        cum = np.cumsum(delta)
        new = np.ones(len(key2), dtype=bool)
        new[1:] = key2[1:] != key2[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(key2)))
        base = np.where(starts > 0, cum[starts - 1], 0)
        active = cum - np.repeat(base, lens)
        before = active - delta
        island_start = (delta > 0) & (before == 0)
        n_isl = np.add.reduceat(island_start.astype(np.int64), starts)
        gap = np.zeros(len(pos), dtype=np.int64)
        same = ~new[1:]  # gap[i] spans pos[i]..pos[i+1] within a key
        gap[:-1] = (pos[1:] - pos[:-1]) * same * (active[:-1] > 0)
        covered = np.add.reduceat(gap, starts)
        return pa.table({
            key_col: pa.array(key2[starts]),
            "n_islands": pa.array(n_isl),
            "covered": pa.array(covered),
        })

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, start_col, end_col])))
    return narrow.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def _stay_scan(ts: np.ndarray, x: np.ndarray, y: np.ndarray,
               r2: int, min_dur_us: int):
    """Anchor-based stay-point scan over ONE track (Li et al. 2008,
    'Mining user similarity based on location history'): from each
    anchor i, extend while points stay within radius of the anchor;
    emit the run as a stay if it lasts >= min_dur_us. Returns list of
    (start_idx, end_idx_exclusive). The tail distance test is
    vectorized per anchor; sequential anchor jumps are inherent to the
    definition (each stay's extent depends on the previous cut)."""
    n = len(ts)
    out = []
    i = 0
    while i < n:
        dx = x[i + 1:] - x[i]
        dy = y[i + 1:] - y[i]
        far = (dx * dx + dy * dy) > r2
        j = int(np.argmax(far)) if far.any() else len(far)
        end = i + 1 + j          # first index beyond radius (or n)
        if ts[end - 1] - ts[i] >= min_dur_us:
            out.append((i, end))
            i = end
        else:
            i += 1
    return out


def stay_points(ds, key_col: str, ts_col: str, x_col: str, y_col: str,
                radius: int, min_dur_s: int, buckets: int | None = None):
    """Per-key stay-point (dwell) detection over timestamp-ordered
    integer-coordinate tracks: a stay is a maximal run of consecutive
    points within `radius` of its FIRST point lasting >= min_dur_s.
    The GPS-trajectory segmentation staple (rows-only: the anchor scan
    is sequential per track, not SQL-expressible).

    Scale shape: ONE hash(key)%buckets shuffle of the narrow
    (key, ts, x, y) projection (the track_simplify shape); per-track
    anchor scan with vectorized tail distance tests. Emits exact
    integers only (centroid as sum_x/sum_y + n_points, so downstream
    compares are bit-stable).

    Returns (key, start_us, end_us, n_points, sum_x, sum_y)."""
    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    r2 = int(radius) * int(radius)
    min_dur_us = int(min_dur_s) * 1_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        b = (k.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "start_us": pa.array([], type=pa.int64()),
                          "end_us": pa.array([], type=pa.int64()),
                          "n_points": pa.array([], type=pa.int64()),
                          "sum_x": pa.array([], type=pa.int64()),
                          "sum_y": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, k))
        k, ts, x, y = k[order], ts[order], x[order], y[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        cols = {c: [] for c in ("key", "s", "e", "n", "sx", "sy")}
        cx = np.cumsum(x)
        cy = np.cumsum(y)
        for s, e in zip(starts, ends):
            for i, j in _stay_scan(ts[s:e], x[s:e], y[s:e],
                                   r2, min_dur_us):
                cols["key"].append(int(k[s]))
                cols["s"].append(int(ts[s + i]))
                cols["e"].append(int(ts[s + j - 1]))
                cols["n"].append(j - i)
                lo = s + i
                hi = s + j - 1
                cols["sx"].append(int(cx[hi] - (cx[lo - 1] if lo else 0)))
                cols["sy"].append(int(cy[hi] - (cy[lo - 1] if lo else 0)))
        return pa.table({key_col: pa.array(cols["key"], type=pa.int64()),
                         "start_us": pa.array(cols["s"], type=pa.int64()),
                         "end_us": pa.array(cols["e"], type=pa.int64()),
                         "n_points": pa.array(cols["n"], type=pa.int64()),
                         "sum_x": pa.array(cols["sx"], type=pa.int64()),
                         "sum_y": pa.array(cols["sy"], type=pa.int64())})

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, x_col, y_col])))
    return narrow.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def transition_counts(ds, key_col: str, ts_col: str, state_col: str,
                      tie_col: str | None = None,
                      buckets: int | None = None):
    """Markov transition counts: for each key's timestamp-ordered event
    sequence, count (from_state -> to_state) over consecutive pairs,
    summed across keys — the OD-matrix / user-flow operator (origin-
    destination trip counting when states are map tiles). SQL twin:
    LAG(state) OVER (PARTITION BY key ORDER BY ts).

    Scale shape: ONE hash(key)%buckets shuffle of the narrow
    (key, ts, state) projection; per-bucket lexsort + shifted compare
    builds pairs, an IN-BUCKET np.unique pre-agg collapses them, and
    one tiny native Sum groupby folds buckets. Transition matrices are
    bounded by |states|^2 regardless of row count.

    Returns (from_state:int64, to_state:int64, n_trips:int64)."""
    from ray.data.aggregate import Sum

    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    cols = list(dict.fromkeys([key_col, ts_col, state_col]
                              + ([tie_col] if tie_col else [])))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        b = (k.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"_f": pa.array([], type=pa.int64()),
                          "_t": pa.array([], type=pa.int64()),
                          "_n": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        st = g[state_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        order = np.lexsort((tie, ts, k))
        ks, sts = k[order], st[order]
        same = ks[1:] == ks[:-1]
        f, t = sts[:-1][same], sts[1:][same]
        if len(f) == 0:
            return empty
        pair = f * np.int64(1 << 32) + t       # states < 2^31, >= 0
        up, cnt = np.unique(pair, return_counts=True)
        return pa.table({"_f": pa.array(up >> np.int64(32)),
                         "_t": pa.array(up & np.int64(0xFFFFFFFF)),
                         "_n": pa.array(cnt.astype(np.int64))})

    folded = ds.select_columns(cols) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow") \
        .groupby(["_f", "_t"]).aggregate(Sum("_n", alias_name="n_trips"))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({"from_state": batch["_f"].cast(pa.int64()),
                         "to_state": batch["_t"].cast(pa.int64()),
                         "n_trips": batch["n_trips"].cast(pa.int64())})

    return folded.map_batches(fin, batch_format="pyarrow")


def time_weighted_sum(ds, key_col: str, ts_col: str, value_col: str,
                      tie_col: str | None = None,
                      buckets: int | None = None):
    """Per-key time-weighted value integral: sum of
    (t_next - t) * value over consecutive event pairs (each value held
    until the next observation — the step-function integral behind
    time-weighted averages of sensor/state streams). Exact int64 when
    values are integers; SQL twin is LEAD(ts) OVER (...).

    Same one-bucket-shuffle shape as transition_counts; per-bucket the
    integral is one shifted multiply + segmented reduceat.

    Returns (key, n_segments:int64, tw_sum:int64)."""
    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    cols = list(dict.fromkeys([key_col, ts_col, value_col]
                              + ([tie_col] if tie_col else [])))

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        b = (k.astype(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "n_segments": pa.array([], type=pa.int64()),
                          "tw_sum": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        order = np.lexsort((tie, ts, k))
        ks, tss, vs = k[order], ts[order], v[order]
        same = ks[1:] == ks[:-1]
        seg = np.zeros(len(ks), dtype=np.int64)
        seg[:-1] = (tss[1:] - tss[:-1]) * vs[:-1] * same
        nseg = np.zeros(len(ks), dtype=np.int64)
        nseg[:-1] = same
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ~same
        starts = np.flatnonzero(new)
        return pa.table({
            key_col: pa.array(ks[starts]),
            "n_segments": pa.array(np.add.reduceat(nseg, starts)),
            "tw_sum": pa.array(np.add.reduceat(seg, starts)),
        })

    return ds.select_columns(cols) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def longest_streak_per_key(ds, key_col: str, ts_col: str,
                           buckets: int | None = None):
    """Per-key longest consecutive-day activity streak (gaps-and-islands
    over distinct active days) — the engagement metric form of
    time-filter's validity-interval arithmetic
    (/root/reference/src/command_time_filter.cpp:169-178 successor
    logic, reduced to day granularity).

    Scale shape: per-batch distinct (key, day) pairs bound the shuffle,
    ONE hash(key)%buckets exchange, then a single lexsort per bucket
    finishes the global distinct, splits islands where consecutive days
    differ by more than one, and folds per-key max/sum with reduceat —
    no per-key Python. Days are floor(ts / 86400s) in UTC, matching
    SQL's CAST(ts AS DATE) for non-negative epochs.

    Returns (key_col, n_active_days:int64, max_streak:int64)."""
    import ray

    from ..functions.hashing import hash_str_u64

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    s = ds.schema()
    key_type = dict(zip(s.names, s.types))[key_col]
    DAY_US = np.int64(86_400_000_000)

    def pre(batch: pa.Table) -> pa.Table:
        k = batch[key_col]
        ts = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        day = ts // DAY_US
        t = pa.table({key_col: k, "_day": pa.array(day)}) \
            .group_by([key_col, "_day"]).aggregate([])
        kk = t[key_col]
        if pa.types.is_integer(kk.type):
            b = (kk.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(kk) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_b", pa.array(b))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=key_type),
                          "n_active_days": pa.array([], type=pa.int64()),
                          "max_streak": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        keys = np.asarray(g[key_col].to_pylist())
        day = g["_day"].to_numpy(zero_copy_only=False)
        o = np.lexsort((day, keys))
        keys, day = keys[o], day[o]
        first = np.ones(len(keys), dtype=bool)
        first[1:] = (keys[1:] != keys[:-1]) | (day[1:] != day[:-1])
        keys, day = keys[first], day[first]
        newk = np.ones(len(keys), dtype=bool)
        newk[1:] = keys[1:] != keys[:-1]
        # island starts: new key OR a gap of more than one day
        brk = newk.copy()
        brk[1:] |= (day[1:] - day[:-1]) != 1
        istart = np.flatnonzero(brk)
        ilen = np.diff(np.append(istart, len(keys)))
        # islands are contiguous per key; fold max/sum per key run
        ikey_first = np.flatnonzero(newk[istart])
        mx = np.maximum.reduceat(ilen, ikey_first)
        tot = np.add.reduceat(ilen, ikey_first)
        kstarts = np.flatnonzero(newk)
        return pa.table({
            key_col: pa.array(keys[kstarts].tolist(), type=key_type),
            "n_active_days": pa.array(tot.astype(np.int64)),
            "max_streak": pa.array(mx.astype(np.int64))})

    return ds.select_columns([key_col, ts_col]) \
        .map_batches(pre, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


def gyration_per_key(ds, key_col: str, x_col: str, y_col: str,
                     buckets: int | None = None):
    """Per-key radius of gyration (Gonzalez et al. 2008 mobility
    metric): rg^2 = E[x^2] + E[y^2] - E[x]^2 - E[y]^2 over each key's
    points, from EXACT int64 moment sums (inputs must be pre-scaled so
    sum(x^2) < 2^53 — the lattice /1e5 discipline), with the float
    expression tree mirrored operation-for-operation by the SQL twin:
    (sx2+sy2)/n - (sx/n)^2 - (sy/n)^2, every division IEEE double.

    Scale shape: per-batch Arrow group_by partial moment sums, ONE
    hash(key) bucket shuffle of 5 numbers per key per block, reduceat
    final fold. Returns (key, n:int64, rg2:float64)."""
    import ray

    from ..functions.hashing import hash_str_u64

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    s = ds.schema()
    key_type = dict(zip(s.names, s.types))[key_col]

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({key_col: batch[key_col],
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sx2": pa.array(x * x), "sy2": pa.array(y * y)})
        agg = t.group_by(key_col).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sx2", "sum"),
             ("sy2", "sum"), ([], "count_all")])
        k = agg[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return pa.table({key_col: k,
                         "sx": agg["sx_sum"].cast(pa.int64()),
                         "sy": agg["sy_sum"].cast(pa.int64()),
                         "sx2": agg["sx2_sum"].cast(pa.int64()),
                         "sy2": agg["sy2_sum"].cast(pa.int64()),
                         "n": agg["count_all"].cast(pa.int64()),
                         "_b": pa.array(b)})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=key_type),
                          "n": pa.array([], type=pa.int64()),
                          "rg2": pa.array([], type=pa.float64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        keys = np.asarray(g[key_col].to_pylist())
        o = np.argsort(keys, kind="stable")
        keys = keys[o]
        new = np.ones(len(keys), dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        ks = np.flatnonzero(new)
        sums = {c: np.add.reduceat(
            g[c].to_numpy(zero_copy_only=False)[o], ks)
            for c in ("sx", "sy", "sx2", "sy2", "n")}
        n = sums["n"].astype(np.float64)
        mx = sums["sx"].astype(np.float64) / n
        my = sums["sy"].astype(np.float64) / n
        rg2 = (sums["sx2"] + sums["sy2"]).astype(np.float64) / n \
            - mx * mx - my * my
        return pa.table({key_col: pa.array(keys[new].tolist(),
                                           type=key_type),
                         "n": pa.array(sums["n"].astype(np.int64)),
                         "rg2": pa.array(rg2)})

    return ds.select_columns([key_col, x_col, y_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


def sliding_distinct(ds, ts_col: str, val_col: str, width_s: int,
                     hop_s: int, buckets: int | None = None):
    """Exact COUNT(DISTINCT val) per hopping window — the sliding-window
    active-users metric (tumbling DAU generalized; the raw-count twin is
    sliding_window_aggregate). Distinct cannot pre-aggregate across
    windows, so each row explodes into its width/hop windows map-side
    WITH per-batch (window, val) dedup first, then ONE
    hash(window)%buckets shuffle; a single lexsort per bucket finishes
    the global distinct and the per-window count in one pass.

    Returns (window:int64 epoch-seconds start, n_distinct:int64)."""
    import ray

    if width_s % hop_s:
        raise ValueError("hop_s must divide width_s")
    k = width_s // hop_s
    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    from ..functions.hashing import hash_str_u64

    def explode(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        base = (us // np.int64(hop_s * 1_000_000)) * np.int64(hop_s)
        vals = batch[val_col]
        n = len(base)
        win = (np.repeat(base, k)
               - np.tile(np.arange(k, dtype=np.int64) * hop_s, n))
        t = pa.table({"window": pa.array(win),
                      val_col: vals.take(pa.array(
                          np.repeat(np.arange(n, dtype=np.int64), k)))}) \
            .group_by(["window", val_col]).aggregate([])
        w = t["window"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_b", pa.array((w.astype(np.uint64) % np.uint64(buckets))
                           .astype(np.int32)))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({"window": pa.array([], type=pa.int64()),
                          "n_distinct": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "window" not in g.schema.names:
            return empty
        w = g["window"].to_numpy(zero_copy_only=False)
        v = np.asarray(g[val_col].to_pylist())
        o = np.lexsort((v, w))
        w, v = w[o], v[o]
        first = np.ones(len(w), dtype=bool)
        first[1:] = (w[1:] != w[:-1]) | (v[1:] != v[:-1])
        w = w[first]
        neww = np.ones(len(w), dtype=bool)
        neww[1:] = w[1:] != w[:-1]
        starts = np.flatnonzero(neww)
        cnt = np.diff(np.append(starts, len(w)))
        return pa.table({"window": pa.array(w[neww]),
                         "n_distinct": pa.array(cnt.astype(np.int64))})

    return ds.select_columns([ts_col, val_col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


def keyed_transition_counts(ds, key_col: str, ts_col: str, state_col: str,
                      tie_col: str | None = None):
    """Per-key first-order Markov transition counts: for each key, order
    events by (ts, tie) and count every consecutive (from_state ->
    to_state) pair — the event-sequence transition matrix (the LEAD()
    window + GROUP BY of session analytics, and the statistic behind
    Markov-chain next-event models trained on clickstreams).

    Scale shape: ONE hash(key)%4*CPU bucket shuffle of the narrow
    (key, ts, tie, state) projection via group_by_key_bucket; inside a
    bucket one lexsort + shifted compare emits the pairs and one
    composite-code np.unique counts them — no per-key Python, no second
    shuffle (each key's rows land wholly in one bucket, so bucket-local
    counts are globally exact). Returns (key, from_state, to_state,
    n:int64)."""
    from ..blocks import group_by_key_bucket

    cols = [key_col, ts_col, state_col] + ([tie_col] if tie_col else [])
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    int_key = pa.types.is_integer(key_type)

    def per_group(g: pa.Table) -> pa.Table:
        schema = pa.schema([(key_col, key_type),
                            ("from_state", pa.string()),
                            ("to_state", pa.string()),
                            ("n", pa.int64())])
        if g.num_rows < 2 or key_col not in g.schema.names:
            return schema.empty_table()
        if int_key:
            keys = g[key_col].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        else:
            keys = np.asarray(g[key_col].to_pylist(), dtype=object) \
                .astype(str)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if tie_col:
            tie = g[tie_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((tie, ts, keys))
        else:
            order = np.lexsort((ts, keys))
        ks, st = keys[order], np.asarray(
            g[state_col].to_pylist(), dtype=object).astype(str)[order]
        same = ks[1:] == ks[:-1]
        if not same.any():
            return schema.empty_table()
        pk = ks[1:][same]
        frm = st[:-1][same]
        to = st[1:][same]
        # composite-code unique: states are low-cardinality, keys many
        us, sinv = np.unique(np.concatenate([frm, to]),
                             return_inverse=True)
        nst = np.int64(len(us))
        fi, ti = sinv[:len(frm)], sinv[len(frm):]
        uk, kinv = np.unique(pk, return_inverse=True)
        code = (kinv.astype(np.int64) * nst + fi) * nst + ti
        uc, cnt = np.unique(code, return_counts=True)
        k_out = uk[uc // (nst * nst)]
        f_out = us[(uc // nst) % nst]
        t_out = us[uc % nst]
        return pa.table({
            key_col: pa.array(k_out.tolist(), type=key_type),
            "from_state": pa.array(f_out.tolist(), type=pa.string()),
            "to_state": pa.array(t_out.tolist(), type=pa.string()),
            "n": pa.array(cnt.astype(np.int64))})

    return group_by_key_bucket(ds.select_columns(cols), key_col,
                               per_group)


def ring_area_per_key(ds, key_col: str, ts_col: str, x_col: str,
                      y_col: str, tie_col: str | None = None):
    """Per-key signed doubled shoelace area of the closed ring each
    key's points trace in timestamp order, the polygon closed by
    joining the last point back to the first — EXACT int64 cross-
    product sums, so the distributed fold is bit-identical to the SQL
    LEAD/FIRST_VALUE window oracle (reference relative: osmium's area
    assembly computes ring areas for orientation the same shoelace way,
    /root/reference/src/exporter via functions/geometry.assemble_rings;
    this is its per-track analytics twin).

    Inputs must be pre-scaled small ints (|x|,|y| <= ~1e6) so each
    cross term and the per-key sum stay far inside int64.

    Scale shape: ONE hash(key)%buckets shuffle of the narrow (key, ts,
    x, y) projection (the track_length shape), then a multi-key
    vectorized lexsort fold per bucket: a next-index array with run
    wraparound (each run's last row points at its first) makes the ring
    closure branch-free. Returns (key, n_points:int64, area2:int64) —
    area2 positive for counter-clockwise rings, negative clockwise."""
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key_col not in g.schema.names:
            return pa.table({key_col: pa.array([], type=key_type),
                             "n_points": pa.array([], type=pa.int64()),
                             "area2": pa.array([], type=pa.int64())})
        keys = np.asarray(g[key_col].to_pylist(), dtype=object)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tie = (g[tie_col].to_numpy(zero_copy_only=False) if tie_col
               else np.zeros(len(ts), dtype=np.int64))
        x = g[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = g[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tie, ts, keys.astype(str)))
        ks, xs, ys = keys[order], x[order], y[order]
        n = len(ks)
        same = np.concatenate([[False], ks[1:] == ks[:-1]])
        starts = np.flatnonzero(~same)
        ends = np.concatenate([starts[1:], [n]])
        nxt = np.arange(1, n + 1, dtype=np.int64)
        nxt[ends - 1] = starts               # close each ring
        cross = xs * ys[nxt] - xs[nxt] * ys
        area2 = np.add.reduceat(cross, starts)
        return pa.table({
            key_col: pa.array(ks[starts].tolist(), type=key_type),
            "n_points": pa.array((ends - starts).astype(np.int64)),
            "area2": pa.array(area2.astype(np.int64)),
        })

    from ..blocks import group_by_key_bucket

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, x_col, y_col]
                           + ([tie_col] if tie_col else []))))
    return group_by_key_bucket(narrow, key_col, per_group)


def gap_fill(ds, key_col: str, ts_col: str, val_col: str, step_s: int,
             tie_col: str, buckets: int | None = None):
    """Per-key regular-time-grid forward fill — the time-series
    gap-filling / resampling primitive (grid points every `step_s`
    seconds from the key's first observation to its last; each grid
    point carries the value of the latest observation at or before it;
    at equal timestamps the larger `tie_col` wins, making repeated runs
    byte-identical).

    Scale shape: ONE group_by_key_bucket shuffle of the narrow
    (key, epoch-second, value, tie) projection, then a fold that never
    does per-key work: forward fill onto a REGULAR grid means
    observation i covers exactly the grid indices
    [ceil(es_i/step), ceil(es_{i+1}/step)), so the fold is a lexsort,
    one run-length dedup, a clipped count per observation, and one
    repeat + segmented-arange emit — output rows stream out proportional
    to grid coverage, no searchsorted per key, no Python per key.

    The SQL twin is the independent top-1-per-grid-point formulation
    (ROW_NUMBER over obs with es <= grid ts). resample_tracks
    (stages/spatial.py) is the positional cousin; this is the
    value-carrying one."""
    import numpy as np

    from ..blocks import group_by_key_bucket

    def pre(batch: pa.Table) -> pa.Table:
        es = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // 10**6
        return pa.table({key_col: batch[key_col],
                         "es": pa.array(es),
                         "v": batch[val_col],
                         "t": batch[tie_col]})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "grid_ts": pa.array([], type=pa.int64()),
                          "value": pa.array([], type=pa.float64())})
        if g.num_rows == 0:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        es = g["es"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        n = len(k)
        o = np.lexsort((t, es, k))
        k, es, v = k[o], es[o], v[o]
        # last row of each equal (key, es) run wins (max tie there)
        last = np.r_[(k[:-1] != k[1:]) | (es[:-1] != es[1:]), True]
        k, es, v = k[last], es[last], v[last]
        n = len(k)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], n] - 1
        start_m = (es + step_s - 1) // step_s       # es >= 0 (epoch)
        end_m = np.empty(n, dtype=np.int64)
        end_m[:-1] = start_m[1:]
        end_m[ends] = es[ends] // step_s + 1
        cnt = np.maximum(end_m - start_m, 0)
        total = int(cnt.sum())
        if total == 0:
            return empty
        rep = np.repeat(np.arange(n), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        grid_ts = (start_m[rep] + offs) * step_s
        return pa.table({key_col: pa.array(k[rep]),
                         "grid_ts": pa.array(grid_ts),
                         "value": pa.array(v[rep])})

    narrow = ds.map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def gap_outliers(ds, key_col: str, ts_col: str, tie_col: str,
                 factor: float = 3.0, buckets: int | None = None):
    """Per-key inter-arrival anomaly detection: flag every gap between
    consecutive observations that exceeds `factor` x the key's median
    gap — the heartbeat/dropout detector of telemetry pipelines.
    Gaps are exact integer microseconds; the median interpolates as
    lo + (hi-lo)*0.5 (DuckDB quantile_cont bit-parity, the theil_sen
    precedent), and the comparison promotes to double identically in
    both engines.

    ONE group_by_key_bucket shuffle; the fold is two lexsorts (time
    order for gaps, gap order for the segmented median) — Python per
    partition, never per key. Returns (key, tie-of-later-observation,
    gap_us) for flagged gaps."""
    import numpy as np

    from ..blocks import group_by_key_bucket

    def pre(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({key_col: batch[key_col], "us": us,
                         "t": batch[tie_col]})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          tie_col: pa.array([], type=pa.int64()),
                          "gap_us": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        us = g["us"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        o = np.lexsort((t, us, k))
        k, us, t = k[o], us[o], t[o]
        n = len(k)
        same = np.zeros(n, dtype=bool)
        same[1:] = k[1:] == k[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = us[1:] - us[:-1]
        gk, gt, gv = k[same], t[same], gap[same]
        if not len(gk):
            return empty
        o2 = np.lexsort((gv, gk))
        sk, sv = gk[o2], gv[o2]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        sizes = np.diff(np.r_[starts, len(sk)])
        lo = sv[starts + (sizes - 1) // 2].astype(np.float64)
        hi = sv[starts + sizes // 2].astype(np.float64)
        med = lo + (hi - lo) * 0.5
        uk = sk[starts]
        pos = np.searchsorted(uk, gk)
        keep = gv.astype(np.float64) > factor * med[pos]
        return pa.table({key_col: pa.array(gk[keep]),
                         tie_col: pa.array(gt[keep]),
                         "gap_us": pa.array(gv[keep])})

    narrow = ds.select_columns([key_col, ts_col, tie_col]) \
        .map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def trailing_window(ds, key_col: str, ts_col: str, val_col: str,
                    id_col: str, width_s: int,
                    buckets: int | None = None):
    """Per-event trailing window aggregate — for every observation, the
    count and integer-cent sum of the SAME key's observations in the
    preceding `width_s` seconds including the current instant (the
    velocity feature of fraud/abuse pipelines; SQL's RANGE BETWEEN N
    PRECEDING AND CURRENT ROW, whose peer semantics — all rows at the
    same timestamp join the window regardless of tie order — this
    reproduces exactly).

    ONE group_by_key_bucket shuffle; the fold is a lexsort, ONE global
    composite-key searchsorted pair (segment id packed above the
    normalized microsecond offset, so per-key window bounds come from
    two vectorized binary searches over the whole bucket), and a prefix-
    sum difference — no per-key Python, no per-row loop."""
    import numpy as np

    from ..blocks import group_by_key_bucket

    W = np.int64(width_s) * 10**6

    def pre(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        vc = pc.round(pc.multiply(batch[val_col], 100.0)) \
            .cast(pa.int64())
        return pa.table({key_col: batch[key_col], "us": us,
                         "vc": vc, id_col: batch[id_col]})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          id_col: pa.array([], type=pa.int64()),
                          "n_win": pa.array([], type=pa.int64()),
                          "sum_win_c": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        us = g["us"].to_numpy(zero_copy_only=False)
        vc = g["vc"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        n = len(k)
        o = np.lexsort((us, k))
        k, us, vc, ids = k[o], us[o], vc[o], ids[o]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        nseg = np.diff(np.r_[starts, n])
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), nseg)
        base = np.int64(us.min())
        rel = us - base
        # dynamic composite shift: rel must fit below it, segments
        # above it, inside int64 (a bucket spanning years of data with
        # millions of distinct keys would need the per-segment loop)
        shift = np.int64(max(int(rel.max()).bit_length() + 1, 45)) \
            if n else np.int64(45)
        if len(starts) and int(starts.size).bit_length() + int(shift) > 62:
            raise ValueError("trailing_window: bucket time span x key "
                             "count exceeds the composite int64 key; "
                             "raise `buckets`")
        comp = (seg << shift) | rel
        # clamp the lower probe at the segment base: the window never
        # reaches before the key's first row, and the clamp keeps the
        # probe from crossing into the previous segment's key range
        lo = np.searchsorted(comp, (seg << shift)
                             + np.maximum(rel - W, 0), side="left")
        hi = np.searchsorted(comp, (seg << shift) + rel, side="right")
        cs = np.r_[0, np.cumsum(vc)]
        return pa.table({key_col: pa.array(k),
                         id_col: pa.array(ids),
                         "n_win": pa.array(hi - lo),
                         "sum_win_c": pa.array(cs[hi] - cs[lo])})

    narrow = ds.select_columns(
        list(dict.fromkeys([key_col, ts_col, val_col, id_col]))) \
        .map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def keyed_run_lengths(ds, key_col: str, ts_col: str, state_col: str,
                      tie_col: str | None = None):
    """Per-(key, state) run-length statistics: order each key's events
    by (ts, tie) and count its maximal same-state runs plus the longest
    run — the run-length encoding of an event stream (the LAG() <>
    compare + conditional-sum window chain in SQL; the burst/repetition
    signal session analytics layers on a clickstream).

    Scale shape: the keyed_transition_counts discipline — ONE
    hash(key)%4*CPU bucket shuffle of the narrow (key, ts, tie, state)
    projection; inside a bucket one lexsort + shifted compare marks run
    starts and one composite-code np.unique counts runs and their
    lengths — no per-key Python, no second shuffle. Returns (key,
    state, n_runs, max_run)."""
    from ..blocks import group_by_key_bucket

    cols = [key_col, ts_col, state_col] + ([tie_col] if tie_col else [])
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    int_key = pa.types.is_integer(key_type)

    def per_group(g: pa.Table) -> pa.Table:
        schema = pa.schema([(key_col, key_type),
                            (state_col, pa.string()),
                            ("n_runs", pa.int64()),
                            ("max_run", pa.int64())])
        if g.num_rows == 0 or key_col not in g.schema.names:
            return schema.empty_table()
        if int_key:
            keys = g[key_col].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        else:
            keys = np.asarray(g[key_col].to_pylist(), dtype=object) \
                .astype(str)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        st = np.asarray(g[state_col].to_pylist(), dtype=object) \
            .astype(str)
        if tie_col:
            tie = g[tie_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((tie, ts, keys))
        else:
            order = np.lexsort((ts, keys))
        ks, sts = keys[order], st[order]
        n = len(ks)
        start = np.ones(n, dtype=bool)
        start[1:] = (ks[1:] != ks[:-1]) | (sts[1:] != sts[:-1])
        run_id = np.cumsum(start) - 1                 # 0..R-1
        run_len = np.bincount(run_id)                 # length per run
        first = np.flatnonzero(start)                 # row of each run start
        rk, rs = ks[first], sts[first]
        us, sinv = np.unique(rs, return_inverse=True)
        uk, kinv = np.unique(rk, return_inverse=True)
        nst = np.int64(len(us))
        code = kinv.astype(np.int64) * nst + sinv
        uc, cinv = np.unique(code, return_inverse=True)
        n_runs = np.bincount(cinv)
        mx = np.zeros(len(uc), dtype=np.int64)
        np.maximum.at(mx, cinv, run_len)
        return pa.table({
            key_col: pa.array(uk[uc // nst]).cast(key_type),
            state_col: pa.array(us[uc % nst].tolist(), type=pa.string()),
            "n_runs": pa.array(n_runs.astype(np.int64)),
            "max_run": pa.array(mx)})

    return group_by_key_bucket(ds.select_columns(cols), key_col,
                               per_group)


def keyed_gap_digit_hist(ds, key_col: str, ts_col: str, state_col: str,
                         tie_col: str | None = None):
    """Inter-event-gap histogram per state: for each key's (ts, tie)-
    ordered stream, the gap in whole seconds to the PREVIOUS event is
    attributed to the later event's state and bucketed by its decimal
    digit count (an integer-exact log-scale histogram — no float log2,
    so the oracle's length(CAST(gap AS VARCHAR)) reproduces it
    bit-for-bit). The cadence fingerprint of an event stream.

    Scale shape: ONE key-bucket shuffle + segmented lexsort diff;
    per-bucket (state, digits) partial counts feed one tiny
    ≤|states|x20 native groupby Sum. Returns (state, gap_digits, n)."""
    from ray.data.aggregate import Sum

    from ..blocks import group_by_key_bucket

    cols = [key_col, ts_col, state_col] + ([tie_col] if tie_col else [])
    key_type = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    int_key = pa.types.is_integer(key_type)

    def per_group(g: pa.Table) -> pa.Table:
        schema = pa.schema([(state_col, pa.string()),
                            ("gap_digits", pa.int64()),
                            ("n", pa.int64())])
        if g.num_rows < 2 or key_col not in g.schema.names:
            return schema.empty_table()
        if int_key:
            keys = g[key_col].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        else:
            keys = np.asarray(g[key_col].to_pylist(), dtype=object) \
                .astype(str)
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        st = np.asarray(g[state_col].to_pylist(), dtype=object) \
            .astype(str)
        if tie_col:
            tie = g[tie_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((tie, ts, keys))
        else:
            order = np.lexsort((ts, keys))
        ks, tss, sts = keys[order], ts[order], st[order]
        same = ks[1:] == ks[:-1]
        if not same.any():
            return schema.empty_table()
        gap = ((tss[1:] - tss[:-1]) // 1_000_000)[same]  # whole seconds
        state = sts[1:][same]
        # decimal digit count, integer-exact (0 -> 1 digit)
        digits = np.ones(len(gap), dtype=np.int64)
        x = gap // 10
        while (x > 0).any():
            digits += (x > 0)
            x //= 10
        us, sinv = np.unique(state, return_inverse=True)
        code = sinv.astype(np.int64) * 32 + digits
        uc, cnt = np.unique(code, return_counts=True)
        return pa.table({
            state_col: pa.array(us[uc // 32].tolist(),
                                type=pa.string()),
            "gap_digits": pa.array((uc % 32).astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64))})

    parts = group_by_key_bucket(ds.select_columns(cols), key_col,
                                per_group)
    agg = parts.groupby([state_col, "gap_digits"]) \
        .aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda b: pa.table({state_col: b[state_col].cast(pa.string()),
                            "gap_digits": b["gap_digits"].cast(pa.int64()),
                            "n": b["n"].cast(pa.int64())}),
        batch_format="pyarrow")
