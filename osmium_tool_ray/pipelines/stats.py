"""fileinfo / tags-count — aggregate operators.

  * fileinfo (/root/reference/src/command_fileinfo.cpp:73-160 InfoHandler):
    one-pass profile — counts, min/max id, first/last timestamp, bbox
    extent, content CRC. Ray: one multi-aggregate pass; the CRC becomes an
    order-insensitive content hash (xor of row hashes) so it is stable
    under Ray's unordered execution.
  * tags-count (/root/reference/src/command_tags_count.cpp:270-315): grouped
    count of tag keys (or key=value pairs) with optional TagMatcher
    prefilter, min/max-count HAVING, count/name sort. Ray: per-batch partial
    counts (combine) -> small groupby sum -> filter -> sort, the classic
    partial+final pattern replacing the reference's single 16-GB hash map
    (man/osmium-tags-count.md:130)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_str_u64
from ..functions.matchers import StringMatcher, flatten_tags


def fileinfo(ds, id_col: str | None = None, ts_col: str | None = None,
             lon_col: str | None = None, lat_col: str | None = None,
             hash_col: str | None = None,
             version_col: str | None = None) -> dict:
    """Single-pass stream profile. Any column argument may be None.

    version_col additionally reports `multiple_versions` (fileinfo's
    "Multiple object versions" flag, command_fileinfo.cpp:105,143 — the
    reference detects consecutive equal ids in its ordered stream; the
    unordered-distributed equivalent is a distinct (id, version) pair
    count per id: map-side pair dedup, then a narrow groupby(id) count)."""
    from ray.data.aggregate import Count, Max, Min

    aggs = [Count(alias_name="count")]
    for c, mn, mx in ((id_col, "min_id", "max_id"), (ts_col, "first_ts", "last_ts"),
                      (lon_col, "min_lon", "max_lon"), (lat_col, "min_lat", "max_lat")):
        if c is not None:
            aggs += [Min(c, alias_name=mn), Max(c, alias_name=mx)]
    row = ds.aggregate(*aggs)
    out = dict(row)
    if hash_col is not None:
        def h(batch: pa.Table) -> pa.Table:
            v = hash_str_u64(batch[hash_col].cast(pa.string()))
            agg = np.bitwise_xor.reduce(v) if len(v) else np.uint64(0)
            return pa.table({"h": pa.array([int(agg)], type=pa.uint64())})

        parts = ds.map_batches(h, batch_format="pyarrow").take_all()
        acc = 0
        for r in parts:
            acc ^= int(r["h"])
        out["content_hash"] = acc
    if version_col is not None and id_col is not None:
        import pyarrow.compute as pc

        # an id has >1 distinct versions iff min(version) != max(version):
        # map-side pair dedup shrinks the shuffle, one native aggregate,
        # then a tiny any() reduce over the per-id rows
        def pair_dedup(batch: pa.Table) -> pa.Table:
            return batch.select([id_col, version_col]) \
                .group_by([id_col, version_col]).aggregate([])

        per_id = ds.map_batches(pair_dedup, batch_format="pyarrow") \
            .groupby(id_col).aggregate(Min(version_col, alias_name="_vmin"),
                                       Max(version_col, alias_name="_vmax"))

        def has_multi(batch: pa.Table) -> pa.Table:
            m = bool(pc.any(pc.not_equal(batch["_vmin"],
                                         batch["_vmax"])).as_py()) \
                if batch.num_rows else False
            return pa.table({"m": pa.array([m])})

        flags = per_id.map_batches(has_multi, batch_format="pyarrow").take_all()
        out["multiple_versions"] = any(r["m"] for r in flags)
    return out


def fileinfo_json(info: dict, g: str | None = None):
    """fileinfo's output surface: the full profile as a JSON string, or one
    value by `-g` dotted key (command_fileinfo.cpp JSON/-g output modes)."""
    import json

    if g is None:
        return json.dumps(info, sort_keys=True, default=str)
    cur = info
    for part in g.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise KeyError(f"Unknown value '{g}' for -g/--get option.")
        cur = cur[part]
    return cur


def show_head(ds, n: int = 10, fmt: str = "table") -> str:
    """`osmium show` equivalent: pretty-print the head of a dataset
    (driver-side; the reference pipes through a pager,
    command_show.cpp:195)."""
    batch = ds.limit(n).to_pandas()
    if fmt == "json":
        return batch.to_json(orient="records")
    return batch.to_string(index=False)


def tags_count(ds, tags_col: str = "tags", count_values: bool = False,
               key_filter: StringMatcher | None = None,
               min_count: int = 0, max_count: int | None = None,
               sort: str = "count-desc"):
    """Returns a Dataset of (count, key[, value]) rows.

    Partial counts are computed inside each map_batches call (one row per
    distinct key per batch), so the global shuffle only moves pre-reduced
    rows."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys, values, _ = flatten_tags(batch[tags_col])
        kn = np.asarray(keys.to_pylist(), dtype=object)
        if key_filter is not None and len(kn):
            m = key_filter(keys)
            kn = kn[m]
            values = values.filter(pa.array(m))
        if count_values and len(kn):
            vn = np.asarray(values.to_pylist(), dtype=object)
            pairs = pd.DataFrame({"key": kn, "value": vn})
            g = pairs.groupby(["key", "value"], sort=False).size().reset_index(name="n")
            return pa.table({"key": pa.array(g["key"], type=pa.string()),
                             "value": pa.array(g["value"], type=pa.string()),
                             "n": pa.array(g["n"], type=pa.int64())})
        uk, cnt = np.unique(kn.astype(str), return_counts=True) if len(kn) else \
            (np.empty(0, dtype=str), np.empty(0, dtype=np.int64))
        return pa.table({"key": pa.array(uk, type=pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    group_cols = ["key", "value"] if count_values else ["key"]
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_cols).aggregate(Sum("n", alias_name="count"))

    if min_count > 0 or max_count is not None:
        lo, hi = min_count, max_count

        def having(batch: pa.Table) -> pa.Table:
            c = batch["count"].to_numpy(zero_copy_only=False)
            m = c >= lo
            if hi is not None:
                m &= c <= hi
            return batch.filter(pa.array(m))

        agg = agg.map_batches(having, batch_format="pyarrow")

    if sort == "count-desc":
        agg = agg.sort(["count"] + group_cols, descending=[True] + [False] * len(group_cols))
    elif sort == "count-asc":
        agg = agg.sort(["count"] + group_cols)
    elif sort == "name":
        agg = agg.sort(group_cols)
    return agg


def check_sorted(ds, cols: list[str] | tuple[str, ...]) -> dict:
    """Distributed sort-order validation — the `fileinfo` "Objects
    ordered (by type and id)" check (command_fileinfo.cpp:104-151: a
    stream is ordered iff the (type, id) key never decreases between
    consecutive objects; the test/order/fail-order-* fixtures are the
    golden negatives).

    Scale shape: each block reports (first_key, last_key,
    internal_inversions) from one zero-CPU task reading the block in
    place; the driver folds block boundaries in dataset order. Only
    3 tuples/block leave the workers — no row data moves.

    `cols` is the lexicographic key (caller pre-maps categorical kinds
    to rank ints, mirroring the reference's item_type comparison).
    Returns {"sorted": bool, "violations": int} where violations counts
    adjacent inversions (internal + block-boundary)."""
    import ray

    cols = list(cols)

    def _np(col):
        return col.to_numpy(zero_copy_only=False)

    @ray.remote(num_cpus=0)
    def summarize(tbl: pa.Table):
        if tbl.num_rows == 0 or any(c not in tbl.schema.names for c in cols):
            return None
        arrs = [_np(tbl[c]) for c in cols]
        # adjacent lexicographic "decreases": prev > cur
        n = len(arrs[0])
        if n > 1:
            lt = np.zeros(n - 1, dtype=bool)      # cur < prev strictly
            eq = np.ones(n - 1, dtype=bool)
            for a in arrs:
                prev, cur = a[:-1], a[1:]
                lt |= eq & (cur < prev)
                eq &= cur == prev
            inv = int(lt.sum())
        else:
            inv = 0
        first = tuple(a[0] for a in arrs)
        last = tuple(a[-1] for a in arrs)
        return first, last, inv

    parts = [p for p in ray.get([summarize.remote(r)
                                 for r in ds.to_arrow_refs()])
             if p is not None]
    violations = sum(p[2] for p in parts)
    for prev, cur in zip(parts, parts[1:]):
        if cur[0] < prev[1]:        # tuple compare == lexicographic
            violations += 1
    return {"sorted": violations == 0, "violations": int(violations)}


def exact_quantiles(ds, col: str, qs: list[float]) -> pa.Table:
    """EXACT order statistics over a Dataset column — quantile_disc
    semantics (value at sorted index max(ceil(q*n)-1, 0)).

    Scale shape: one distributed sort of the single projected column,
    then only per-block ROW COUNTS reach the driver; each requested
    quantile resolves to (block, local_offset) and a zero-CPU task reads
    that one value in place. No approximation, no full collect — the
    driver sees len(qs) scalars plus the count vector.

    (The approximate counterpart for when even one sort is too much is
    hll/MG-style sketching — see stages/sketches.py; this is the exact
    path the oracle can check.)"""
    import math

    import ray

    from ..blocks import _remote_num_rows

    sorted_ds = ds.select_columns([col]).sort(col).materialize()
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_remote_num_rows.remote(r) for r in refs])
    n = int(sum(counts))
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    starts = np.concatenate([[0], np.cumsum(counts)])

    @ray.remote(num_cpus=0)
    def value_at(tbl: pa.Table, local_idx: int):
        return tbl[col][int(local_idx)].as_py()

    fetches = []
    for q in qs:
        idx = max(math.ceil(q * n) - 1, 0)
        b = int(np.searchsorted(starts, idx, side="right") - 1)
        fetches.append(value_at.remote(refs[b], idx - starts[b]))
    vals = ray.get(fetches)
    return pa.table({"q": pa.array(list(qs), type=pa.float64()),
                     "value": pa.array(vals)})


def grouped_quantiles(ds, key_col: str, col: str, qs: list[float],
                      out_prefix: str = "q") -> "object":
    """Per-key discrete quantiles: quantile_disc(col, q) GROUP BY key.

    One key-hash shuffle; each group sorts its own values vectorized and
    indexes max(ceil(q*n)-1, 0) — per-key row counts are bounded (the
    sessionize/topk assumption), so no global sort is needed. Returns a
    Dataset(key_col, <out_prefix><q>, ...) with one row per key."""
    import math

    qs = list(qs)
    names = [f"{out_prefix}{str(q).replace('.', '_')}" for q in qs]

    def per_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or col not in g.schema.names:
            ktype = g.schema.field(key_col).type \
                if key_col in g.schema.names else pa.string()
            cols = {key_col: pa.array([], type=ktype)}
            for nm in names:
                cols[nm] = pa.array([], type=pa.float64())
            return pa.table(cols)
        v = np.sort(g[col].to_numpy(zero_copy_only=False))
        n = len(v)
        out = {key_col: g[key_col].slice(0, 1)}
        for q, nm in zip(qs, names):
            out[nm] = pa.array([v[max(math.ceil(q * n) - 1, 0)]])
        return pa.table(out)

    return ds.select_columns([key_col, col]).groupby(key_col) \
        .map_groups(per_group, batch_format="pyarrow")


def distinct_per_key(ds, key_col: str, val_col: str):
    """Exact COUNT(DISTINCT val) per key — the exact complement to the
    HLL sketch (stages/sketches.hll_distinct). Per-batch Arrow group_by
    pre-distincts the (key, val) pairs so the shuffle carries
    batch-distinct pairs only, then one native groupby(key, val) finishes
    the global distinct and a second tiny groupby(key) counts. Returns
    (key_col, n_distinct:int64)."""
    import pyarrow as pa
    import ray.data  # noqa: F401  (Dataset methods)
    from ray.data.aggregate import Count

    def pre(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([key_col, val_col])
        return batch.select([key_col, val_col]) \
            .group_by([key_col, val_col]).aggregate([])

    pairs = ds.map_batches(pre, batch_format="pyarrow")
    uniq = pairs.groupby([key_col, val_col]).count() \
        .select_columns([key_col])
    agg = uniq.groupby(key_col).aggregate(Count(alias_name="n_distinct"))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            "n_distinct": batch["n_distinct"].cast(pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def profile_numeric(ds, columns: list[str]):
    """Per-column data-quality profile over numeric columns: row count,
    null count, min, max, and sum of floor(value) (an exact integer
    checksum of magnitude) — the fileinfo idea generalized to arbitrary
    tables (reference: InfoHandler's per-type count/min/max fold,
    /root/reference/src/command_fileinfo.cpp:73-160).

    ONE streaming pass: each batch emits a <=len(columns)-row partial,
    folded by a tiny native groupby over the column-name key. Returns
    (column, n:int64, nulls:int64, vmin:float64, vmax:float64,
    isum:int64)."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Max, Min, Sum

    cols = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, vmins, vmaxs, isums = [], [], [], [], [], []
        for c in cols:
            col = batch[c]
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~np.isnan(v)
            names.append(c)
            ns.append(len(v))
            # nulls surface as NaN after the float64 conversion, so the
            # invalid mask counts both SQL NULLs and data NaNs
            nulls.append(int((~ok).sum()))
            vmins.append(float(v[ok].min()) if ok.any() else np.inf)
            vmaxs.append(float(v[ok].max()) if ok.any() else -np.inf)
            isums.append(int(np.floor(v[ok]).astype(np.int64).sum()))
        return pa.table({
            "column": pa.array(names, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
            "nulls": pa.array(nulls, type=pa.int64()),
            "vmin": pa.array(vmins, type=pa.float64()),
            "vmax": pa.array(vmaxs, type=pa.float64()),
            "isum": pa.array(isums, type=pa.int64()),
        })

    agg = ds.select_columns(cols) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("column").aggregate(
            Sum("n", alias_name="n"), Sum("nulls", alias_name="nulls"),
            Min("vmin", alias_name="vmin"), Max("vmax", alias_name="vmax"),
            Sum("isum", alias_name="isum"))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "column": batch["column"],
            "n": batch["n"].cast(pa.int64()),
            "nulls": batch["nulls"].cast(pa.int64()),
            "vmin": batch["vmin"].cast(pa.float64()),
            "vmax": batch["vmax"].cast(pa.float64()),
            "isum": batch["isum"].cast(pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def rank_transform(ds, order_cols: list[str], rank_col: str = "rn",
                   pct_col: str = "pct"):
    """Rank / percentile transform — append each row's global row number
    in `order_cols` order (ties broken by the full tuple, so include a
    unique tiebreaker) and its percentile pct = (rn - 1) / (n - 1) —
    the rank-normalization feature transform (and the row_number() /
    percent_rank() window at scale).

    Same shape as renumber_ranked / exact_quantiles: ONE distributed
    sort, then only per-block ROW COUNTS reach the driver; each block
    stamps offset + arange and the single division is bit-equal to the
    SQL form."""
    import numpy as np
    import ray
    import ray.data as rd

    from ..blocks import _remote_num_rows

    sorted_ds = ds.sort(order_cols).materialize()
    refs = sorted_ds.to_arrow_refs()
    nrows = ray.get([_remote_num_rows.remote(r) for r in refs])
    refs = [r for r, k in zip(refs, nrows) if k]
    nrows = [k for k in nrows if k]
    total = int(sum(nrows))
    offsets = np.concatenate([[0], np.cumsum(nrows)[:-1]]) \
        if nrows else []

    @ray.remote(num_cpus=0)
    def stamp(tbl: pa.Table, off0: int) -> pa.Table:
        rn = np.arange(off0 + 1, off0 + 1 + tbl.num_rows, dtype=np.int64)
        denom = float(max(total - 1, 1))
        pct = (rn - 1).astype(np.float64) / denom
        return tbl.append_column(rank_col, pa.array(rn)) \
                  .append_column(pct_col, pa.array(pct))

    stamped = [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    if not stamped:
        sch = ds.schema()
        cols = {n: pa.array([], type=t)
                for n, t in zip(sch.names, sch.types)}
        cols[rank_col] = pa.array([], type=pa.int64())
        cols[pct_col] = pa.array([], type=pa.float64())
        return rd.from_arrow(pa.table(cols))
    return rd.from_arrow_refs(stamped)


def ntile_buckets(ds, order_cols: list[str], k: int,
                  out_col: str = "bucket"):
    """NTILE(k) at scale — assign each row its 1-based quantile bucket in
    `order_cols` order (include a unique tiebreaker for determinism):
    the length-bucketed batching transform a training pipeline uses to
    group similar-length documents.

    Same shape as rank_transform: ONE distributed sort, per-block ROW
    COUNTS to the driver, each block stamps its buckets from (offset,
    total) with DuckDB's ntile fill (the first n%k buckets take
    floor(n/k)+1 rows)."""
    import numpy as np
    import ray
    import ray.data as rd

    from ..blocks import _remote_num_rows

    sorted_ds = ds.sort(order_cols).materialize()
    refs = sorted_ds.to_arrow_refs()
    nrows = ray.get([_remote_num_rows.remote(r) for r in refs])
    refs = [r for r, n in zip(refs, nrows) if n]
    nrows = [n for n in nrows if n]
    total = int(sum(nrows))
    offsets = np.concatenate([[0], np.cumsum(nrows)[:-1]]) if nrows else []

    big = total % k
    small_sz = total // k
    cut = big * (small_sz + 1)  # first rank not in an oversized bucket

    @ray.remote(num_cpus=0)
    def stamp(tbl: pa.Table, off0: int) -> pa.Table:
        r = np.arange(off0, off0 + tbl.num_rows, dtype=np.int64)
        if small_sz == 0:
            b = r + 1
        else:
            b = np.where(r < cut, r // (small_sz + 1),
                         big + (r - cut) // small_sz) + 1
        return tbl.append_column(out_col, pa.array(b.astype(np.int64)))

    stamped = [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    if not stamped:
        sch = ds.schema()
        cols = {n: pa.array([], type=t) for n, t in zip(sch.names, sch.types)}
        cols[out_col] = pa.array([], type=pa.int64())
        return rd.from_arrow(pa.table(cols))
    return rd.from_arrow_refs(stamped)


def zscore_per_key(ds, key_col: str, value_col: str,
                   carry_cols: list[str] | None = None,
                   buckets: int | None = None, out_col: str = "z"):
    """Per-key z-score standardization of an INTEGER value column —
    z = (v - mean_k) / std_k with population std — computed EXACTLY in
    float64: the group moments (n, sum, sum-of-squares) are int64 (the
    caller guarantees the values are integers small enough that
    n*S2 - S^2 is exact, e.g. quantities/counts), so mean = S/n,
    std = sqrt(n*S2 - S^2)/n and the final z are each a fixed short
    sequence of IEEE ops — bit-exact against the same SQL expression
    (the snap_to_segments float-mirror discipline). Constant groups
    (variance 0) emit z = 0.0.

    ONE hash(key)-bucket shuffle (not groupby(key): per-key groups are
    tiny and map_groups per key is the known slow path); in-bucket
    segmented lexsort + add.reduceat computes every group's moments and
    the per-row z vectorized. Returns carry_cols + key_col + out_col.
    """
    import ray

    from ..functions.hashing import hash_str_u64

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    carry_cols = carry_cols or []
    cols = [*carry_cols, key_col, value_col]

    def pre(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        k = batch[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.int64)
                 % np.int64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k.cast(pa.string()))
                 % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def per_bucket(g: pa.Table) -> pa.Table:
        out_schema = {c: (g.schema.field(c).type
                          if c in g.schema.names else pa.int64())
                      for c in [*carry_cols, key_col]}
        if g.num_rows == 0 or value_col not in g.schema.names:
            t = {c: pa.array([], type=ty) for c, ty in out_schema.items()}
            t[out_col] = pa.array([], type=pa.float64())
            return pa.table(t)
        keys = g[key_col].to_numpy(zero_copy_only=False)
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        ks, vs = keys[order], v[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        n = np.diff(np.append(starts, len(ks))).astype(np.int64)
        S = np.add.reduceat(vs, starts)
        S2 = np.add.reduceat(vs * vs, starts)
        var_num = n * S2 - S * S
        mean = S / n
        std = np.sqrt(var_num.astype(np.float64)) / n
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (vs - mean[seg]) / std[seg]
        z[var_num[seg] == 0] = 0.0
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        zb = z[inv]
        t = {c: g[c] for c in [*carry_cols, key_col]}
        t[out_col] = pa.array(zb, type=pa.float64())
        return pa.table(t)

    return ds.map_batches(pre, batch_format="pyarrow") \
        .groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def key_skew_profile(ds, key_col: str):
    """Partition-skew diagnostics for a key column — the pre-shuffle
    health check a 100-TB pipeline runs BEFORE deciding to salt (the
    tile_counts hot-key threshold, generalized): row/key totals, the
    hottest key's count and share, and the Gini coefficient of the
    per-key count distribution.

    Scale shape: per-batch Arrow group_by pre-agg -> native Sum per key
    -> a SECOND shrinking fold to the count-of-counts histogram, so the
    driver sees one row per DISTINCT COUNT VALUE (<= sqrt(2*rows) for
    any distribution), never one per key. Gini folds from the
    histogram: equal-count keys occupy consecutive ranks, so the
    rank-weighted sum S = sum(v * block_rank_sum) is computed per block
    — identical (integer) value to SQL's SUM(rn * cnt) over
    ROW_NUMBER() ORDER BY cnt, because rank order within a tie block
    cannot change the sum. gini = (2*S)/(n*T) - (n+1)/n as a fixed
    float64 expression over exact ints (the zscore mirror discipline).

    Returns one row: (n_keys, n_rows, max_cnt:int64, top_share:float64,
    gini:float64)."""
    from ray.data.aggregate import Sum

    def pre(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array(
                [], type=batch.schema.field(key_col).type),
                "_c": pa.array([], type=pa.int64())})
        t = batch.select([key_col]).append_column(
            "_c", pa.array(np.ones(batch.num_rows, np.int64)))
        return t.group_by([key_col]).aggregate([("_c", "sum")]) \
            .rename_columns([key_col, "_c"])

    counts = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby(key_col).aggregate(Sum("_c", alias_name="cnt"))

    def coc(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cnt" not in batch.schema.names:
            return pa.table({"cnt": pa.array([], type=pa.int64()),
                             "_m": pa.array([], type=pa.int64())})
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        u, m = np.unique(c, return_counts=True)
        return pa.table({"cnt": pa.array(u.astype(np.int64)),
                         "_m": pa.array(m.astype(np.int64))})

    hist = counts.map_batches(coc, batch_format="pyarrow") \
        .groupby("cnt").aggregate(Sum("_m", alias_name="m")).take_all()
    v = np.asarray([r["cnt"] for r in hist], dtype=np.int64)
    m = np.asarray([r["m"] for r in hist], dtype=np.int64)
    order = np.argsort(v)
    v, m = v[order], m[order]
    n = int(m.sum())
    total = int((v * m).sum())
    # ranks 1..n ascending by count; block of multiplicity m starting
    # at rank r contributes v * (m*r + m*(m-1)/2)
    starts = np.cumsum(m) - m + 1
    block_rank_sums = m * starts + m * (m - 1) // 2
    s = int((v * block_rank_sums).sum())
    max_cnt = int(v[-1]) if len(v) else 0
    gini = (2.0 * s) / (n * total) - (n + 1.0) / n if n else 0.0
    top_share = max_cnt / total if total else 0.0
    return pa.table({"n_keys": pa.array([n], type=pa.int64()),
                     "n_rows": pa.array([total], type=pa.int64()),
                     "max_cnt": pa.array([max_cnt], type=pa.int64()),
                     "top_share": pa.array([top_share],
                                           type=pa.float64()),
                     "gini": pa.array([gini], type=pa.float64())})


def gini_impurity_per_key(ds, key_col: str, val_col: str):
    """Per-key Gini impurity of the value distribution — the diversity
    score 1 - sum(p_i^2) over each key's category mix (reference
    relative: tags-count's per-key frequency fold,
    /root/reference/src/command_tags_count.cpp:270-315, reduced to one
    robust scalar per key). Exact arithmetic: impurity is computed as
    (N^2 - sum(c^2)) / N^2 over int64 counts, so the single float64
    division is bit-identical to the SQL twin (per-key counts must stay
    below ~3e9 for N^2 to fit int64; past that swap the fold to object
    dtype — the SQL side is already HUGEINT).

    Scale shape: per-batch Arrow group_by pre-aggregates (key, val)
    counts before ONE hash(key) bucket shuffle; inside a bucket one
    lexsort finishes both levels (pair counts, then per-key N, sum c^2,
    n_types) with reduceat folds — no second shuffle, no per-key Python.
    Returns (key_col, n_events:int64, n_types:int64, impurity:float64)."""
    import ray

    import numpy as np
    import pyarrow as pa

    buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    s = ds.schema()
    key_type = dict(zip(s.names, s.types))[key_col]
    out_schema = pa.schema([(key_col, key_type), ("n_events", pa.int64()),
                            ("n_types", pa.int64()),
                            ("impurity", pa.float64())])

    from ..functions.hashing import hash_str_u64

    def pre(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, val_col]) \
            .group_by([key_col, val_col]).aggregate([([], "count_all")])
        k = t[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return pa.table({key_col: k, val_col: t[val_col],
                         "n": t["count_all"].cast(pa.int64()),
                         "_b": pa.array(b)})

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key_col not in g.schema.names:
            return out_schema.empty_table()
        keys = np.asarray(g[key_col].to_pylist())
        vals = np.asarray(g[val_col].to_pylist())
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        keys, vals, n = keys[order], vals[order], n[order]
        # level 1: global (key, val) counts from batch partials
        newp = np.ones(len(keys), dtype=bool)
        newp[1:] = (keys[1:] != keys[:-1]) | (vals[1:] != vals[:-1])
        ps = np.flatnonzero(newp)
        c = np.add.reduceat(n, ps)
        pk = keys[ps]
        # level 2: per-key N, sum c^2, type count
        newk = np.ones(len(pk), dtype=bool)
        newk[1:] = pk[1:] != pk[:-1]
        ks = np.flatnonzero(newk)
        N = np.add.reduceat(c, ks)
        s2 = np.add.reduceat(c * c, ks)
        ntypes = np.diff(np.append(ks, len(pk)))
        imp = (N * N - s2).astype(np.float64) / (N * N).astype(np.float64)
        return pa.table({key_col: pa.array(pk[newk].tolist(), type=key_type),
                         "n_events": pa.array(N.astype(np.int64)),
                         "n_types": pa.array(ntypes.astype(np.int64)),
                         "impurity": pa.array(imp)})

    return ds.map_batches(pre, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


def mad_per_key(ds, key_col: str, col: str, buckets: int | None = None):
    """Per-key robust dispersion: discrete median and MAD (median of
    absolute deviations from the median), the outlier-resistant
    complement of zscore_per_key. Discrete-quantile convention matches
    quantiles_per_key / DuckDB quantile_disc: value at sorted index
    max(ceil(0.5*n)-1, 0), so results are exact row values (no
    interpolation float).

    Scale shape: ONE hash(key)%buckets shuffle of the narrow (key, col)
    projection; inside a bucket BOTH passes are fully vectorized across
    key runs — one lexsort by (key, value) gives every median by index
    arithmetic, a second lexsort by (key, |value - median|) gives every
    MAD; no per-key Python. Returns (key_col, n:int64, median, mad)."""
    import ray

    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_str_u64

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    s = ds.schema()
    key_type = dict(zip(s.names, s.types))[key_col]

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, col])
        k = t[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_b", pa.array(b))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=key_type),
                          "n": pa.array([], type=pa.int64()),
                          "median": pa.array([], type=pa.float64()),
                          "mad": pa.array([], type=pa.float64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        keys = np.asarray(g[key_col].to_pylist())
        v = g[col].to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.lexsort((v, keys))
        keys, v = keys[o], v[o]
        new = np.ones(len(keys), dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(keys)))
        qidx = starts + np.maximum((n + 1) // 2 - 1, 0)  # ceil(n/2)-1
        med = v[qidx]
        runi = np.cumsum(new) - 1
        dev = np.abs(v - med[runi])
        o2 = np.lexsort((dev, keys))
        dev2 = dev[o2]
        mad = dev2[qidx]          # same run layout after the stable sort
        return pa.table({key_col: pa.array(keys[starts].tolist(),
                                           type=key_type),
                         "n": pa.array(n.astype(np.int64)),
                         "median": pa.array(med),
                         "mad": pa.array(mad)})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


def winsorize_per_key(ds, key_col: str, col: str, id_col: str,
                      lo_q: float = 0.05, hi_q: float = 0.95,
                      buckets: int | None = None):
    """Per-key winsorization: clip each row's value to its key's
    [quantile_disc(lo_q), quantile_disc(hi_q)] — the standard outlier
    taming step before per-key normalization (quantile convention:
    value at sorted index max(ceil(q*n)-1, 0), matching
    quantiles_per_key / DuckDB quantile_disc).

    Scale shape: ONE hash(key)%buckets shuffle of the (key, id, value)
    projection; inside a bucket one lexsort yields every key's both
    quantiles by index arithmetic and the clip is one np.clip — no
    second pass, no join back. Returns (id_col, key_col, value_w)."""
    import ray

    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_str_u64

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    s = ds.schema()
    types = dict(zip(s.names, s.types))

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, key_col, col])
        k = t[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_b", pa.array(b))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=types[id_col]),
                          key_col: pa.array([], type=types[key_col]),
                          "value_w": pa.array([], type=pa.float64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        keys = np.asarray(g[key_col].to_pylist())
        ids = np.asarray(g[id_col].to_pylist())
        v = g[col].to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.lexsort((v, keys))
        keys, ids, v = keys[o], ids[o], v[o]
        new = np.ones(len(keys), dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(keys)))
        runi = np.cumsum(new) - 1
        lo_i = starts + np.maximum(np.ceil(lo_q * n).astype(np.int64) - 1, 0)
        hi_i = starts + np.maximum(np.ceil(hi_q * n).astype(np.int64) - 1, 0)
        vw = np.clip(v, v[lo_i][runi], v[hi_i][runi])
        return pa.table({id_col: pa.array(ids.tolist(), type=types[id_col]),
                         key_col: pa.array(keys.tolist(),
                                           type=types[key_col]),
                         "value_w": pa.array(vw)})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


def _skyline_keep(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the 2D maxima (Pareto front, maximize both, strict
    dominance — rows equal in both coordinates all survive). One lexsort
    (x desc, y desc) then segmented group-max + running cummax over
    strictly-greater-x groups; fully vectorized."""
    o = np.lexsort((-y, -x))
    xs, ys = x[o], y[o]
    newg = np.ones(len(xs), dtype=bool)
    newg[1:] = xs[1:] != xs[:-1]
    gidx = np.cumsum(newg) - 1
    gmax = ys[newg]                      # per-group max y (y desc in group)
    before = np.empty_like(gmax)
    if len(gmax):
        before[0] = gmax[0]              # unused for group 0 (masked below)
        np.maximum.accumulate(gmax[:-1], out=before[1:])
    keep = (ys == gmax[gidx]) & ((gidx == 0) | (gmax[gidx] > before[gidx]))
    return o[keep]


def skyline(ds, x_col: str, y_col: str, carry_cols: list[str] | None = None):
    """Skyline / Pareto-front query: rows not strictly dominated in the
    (maximize x_col, maximize y_col) plane — the classic multi-criteria
    operator (Borzsony et al., ICDE 2001 "The Skyline Operator");
    'newest AND highest-value' rows with no better-on-both competitor.

    Scale shape: the skyline of a union is the skyline of the union of
    per-block skylines, so each block reduces to its LOCAL front
    map-side (output ~O(log n) rows per block for random data), and one
    final single-partition fold merges them — no all-to-all shuffle,
    driver never holds row-scale data. Exact-oracle-able as a SQL
    NOT EXISTS anti-join. Ties: rows equal on BOTH axes are mutually
    non-dominating and all survive (matching the SQL semantics).
    Returns carry_cols + (x_col, y_col)."""
    carry_cols = list(carry_cols or [])
    cols = list(dict.fromkeys(carry_cols + [x_col, y_col]))
    s = ds.schema()
    types = dict(zip(s.names, s.types))
    schema = pa.schema([(c, types[c]) for c in cols])

    def _xy(t: pa.Table):
        x = t[x_col]
        if pa.types.is_timestamp(x.type):
            x = x.cast(pa.timestamp("us")).cast(pa.int64())
        y = t[y_col]
        if pa.types.is_timestamp(y.type):
            y = y.cast(pa.timestamp("us")).cast(pa.int64())
        return (x.to_numpy(zero_copy_only=False),
                y.to_numpy(zero_copy_only=False))

    def local(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if t.num_rows == 0:
            return schema.empty_table()
        x, y = _xy(t)
        return t.take(pa.array(np.sort(_skyline_keep(x, y))))

    return ds.map_batches(local, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(local, batch_size=None, batch_format="pyarrow")


def global_rank(ds, order_cols: list[str], descending=None,
                out_col: str = "rank"):
    """Distributed ROW_NUMBER() OVER (ORDER BY order_cols): ONE
    distributed sort, then each block's ranks are its global offset +
    local position — the offsets are an exclusive scan of per-block ROW
    COUNTS on the driver (scalars only, blocks x 8 bytes; the
    running_total global-scan shape with value==1 specialized away).
    Deterministic whenever order_cols form a total order (callers pass
    a unique tiebreak column last). Returns the input columns +
    out_col (1-based int64)."""
    import ray
    import ray.data as rd

    from ..blocks import _remote_num_rows

    sorted_ds = ds.sort(order_cols, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()
    nrows = ray.get([_remote_num_rows.remote(r) for r in refs])
    pairs = [(r, n) for r, n in zip(refs, nrows) if n]
    offsets = np.concatenate([[0], np.cumsum([n for _, n in pairs])])

    @ray.remote(num_cpus=0)
    def stamp(tbl: pa.Table, off: int):
        return tbl.append_column(
            out_col, pa.array(off + 1 + np.arange(tbl.num_rows,
                                                  dtype=np.int64)))

    out = [stamp.remote(r, int(o)) for (r, _), o in zip(pairs, offsets)]
    if not out:
        return sorted_ds
    return rd.from_arrow_refs(out)


def rrf_fuse(ranked_a, ranked_b, id_col: str, rank_a_col: str,
             rank_b_col: str, k: int = 60, out_col: str = "rrf"):
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009): combine two
    rankings of the same id universe into one score
        rrf = 1/(k + rank_a) + 1/(k + rank_b)
    — the standard hybrid-search merge (BM25 list + embedding list).

    Scale shape: ONE bucketed equality attach of ranking B onto ranking
    A (blocks.attach_lookup_bucketed — neither side driver-resident),
    then a shuffle-free vectorized score map. The two-term sum is
    evaluated left-to-right in both the numpy kernel and the SQL twin,
    so scores match bit-for-bit (correctly-rounded IEEE divide/add
    only). Ids absent from ranking B get a null score."""
    from ..blocks import attach_lookup_bucketed

    joined = attach_lookup_bucketed(ranked_a, ranked_b, id_col,
                                    rank_b_col, rank_b_col,
                                    lookup_key=id_col)

    def score(batch: pa.Table) -> pa.Table:
        ra = batch[rank_a_col].to_numpy(zero_copy_only=False)
        rb = batch[rank_b_col].to_numpy(zero_copy_only=False)
        s = 1.0 / (float(k) + ra) + 1.0 / (float(k) + rb)
        return batch.append_column(out_col, pa.array(s,
                                                     type=pa.float64()))

    return joined.map_batches(score, batch_format="pyarrow")


def mann_kendall_per_key(ds, key_col: str, ts_col: str, val_col: str,
                         buckets: int | None = None):
    """Per-key Mann-Kendall trend statistic S = sum over pairs with
    ts_i < ts_j of sign(v_j - v_i), plus the qualifying pair count —
    the standard nonparametric monotonic-trend test (Mann 1945, Kendall
    1975). Exact integers; pairs with equal timestamps do not qualify,
    v-ties contribute 0.

    The SQL twin is the O(n^2) self-join; this fold is O(n log^2 n):
    ONE group_by_key_bucket shuffle, then level-wise merge counting of
    ascent pairs across ALL keys of a bucket at once — at level L,
    pairs whose per-key time ranks first diverge at bit L are counted
    via one lexsort by (key, rank>>L+1, v) and a cumulative count of
    left-half elements with strictly smaller v (run-start cumsum
    arithmetic, no per-key Python). v-tie and ts-tie pair counts come
    from run-length C(c,2) folds; the identity
    S = 2*ascents + vties - C(n,2) - equal_ts_ascents assembles S.

    Keys with zero qualifying pairs (single point, or all points at one
    timestamp) are dropped, matching the join-based SQL twin row set.
    """
    import numpy as np

    from ..blocks import group_by_key_bucket

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "s_stat": pa.array([], type=pa.int64()),
                          "n_pairs": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        if ts.dtype.kind == "M":
            ts = ts.view(np.int64)
        v = g[val_col].to_numpy(zero_copy_only=False)
        n = len(k)
        o = np.lexsort((v, ts, k))
        k, ts, v = k[o], ts[o], v[o]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        uk = k[starts]
        nseg = np.diff(np.r_[starts, n])
        r = np.arange(n) - np.repeat(starts, nseg)
        seg_id = np.repeat(np.arange(len(uk)), nseg)
        c2 = nseg.astype(np.int64) * (nseg - 1) // 2

        def run_pair_counts(*cols):
            diff = np.zeros(n - 1, dtype=bool) if n > 1 else \
                np.zeros(0, dtype=bool)
            for c in (k,) + cols:
                diff |= c[1:] != c[:-1]
            rs = np.flatnonzero(np.r_[True, diff])
            rl = np.diff(np.r_[rs, n]).astype(np.int64)
            return np.bincount(seg_id[rs], weights=rl * (rl - 1) // 2,
                               minlength=len(uk)).astype(np.int64)

        ts_pairs = run_pair_counts(ts)
        tsv_pairs = run_pair_counts(ts, v)
        # v-tie pairs need (key, v) runs regardless of ts: resort
        ov = np.lexsort((v, k))
        kv, vv = k[ov], v[ov]
        rs = np.flatnonzero(np.r_[True, (kv[1:] != kv[:-1])
                                  | (vv[1:] != vv[:-1])]) \
            if n > 1 else np.array([0])
        rl = np.diff(np.r_[rs, n]).astype(np.int64)
        t_v = np.bincount(np.searchsorted(uk, kv[rs]),
                          weights=rl * (rl - 1) // 2,
                          minlength=len(uk)).astype(np.int64)

        ascents = np.zeros(len(uk), dtype=np.int64)
        max_n = int(nseg.max())
        lev = 0
        while (1 << lev) < max_n:
            parent = r >> (lev + 1)
            half = (r >> lev) & 1
            oo = np.lexsort((half, v, parent, k))
            kk, pp, vv2, hh = k[oo], parent[oo], v[oo], half[oo]
            segl = np.flatnonzero(np.r_[True, (kk[1:] != kk[:-1])
                                        | (pp[1:] != pp[:-1])]) \
                if n > 1 else np.array([0])
            left = (hh == 0).astype(np.int64)
            cl = np.cumsum(left)
            base = np.repeat(cl[segl] - left[segl],
                             np.diff(np.r_[segl, n]))
            vrs = np.flatnonzero(np.r_[True, (kk[1:] != kk[:-1])
                                       | (pp[1:] != pp[:-1])
                                       | (vv2[1:] != vv2[:-1])]) \
                if n > 1 else np.array([0])
            vstart = np.repeat(vrs, np.diff(np.r_[vrs, n]))
            cl_before = np.where(vstart > 0,
                                 cl[np.maximum(vstart - 1, 0)], 0)
            contrib = cl_before - base
            right = hh == 1
            np.add.at(ascents, np.searchsorted(uk, kk[right]),
                      contrib[right])
            lev += 1

        s = 2 * ascents + t_v - c2 - (ts_pairs - tsv_pairs)
        n_pairs = c2 - ts_pairs
        keep = n_pairs > 0
        return pa.table({key_col: pa.array(uk[keep]),
                         "s_stat": pa.array(s[keep]),
                         "n_pairs": pa.array(n_pairs[keep])})

    narrow = ds.select_columns([key_col, ts_col, val_col])
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def cusum_changepoint_per_key(ds, key_col: str, ts_col: str,
                              val_col: str, tie_col: str,
                              buckets: int | None = None):
    """Per-key CUSUM changepoint detection (Page 1954 / the standard
    at-most-one-changepoint scan): order each key's series by
    (ts, tie), form prefix sums S_i of integer cents, and report the
    split index maximizing |n*S_i - i*S_n| (the mean-shift CUSUM
    statistic scaled by n to stay in exact int64; ties resolve to the
    smallest index, i ranges over 1..n-1 so keys with one point drop).

    ONE group_by_key_bucket shuffle of the narrow projection; the fold
    is segmented cumsum + one lexsort argmax across every key of the
    bucket at once. The SQL twin is the window-function prefix-sum +
    top-1 QUALIFY formulation."""
    import numpy as np

    from ..blocks import group_by_key_bucket

    def pre(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.round(pc.multiply(batch[val_col], 100.0)) \
            .cast(pa.int64())
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({key_col: batch[key_col], "us": us,
                         "vc": vc, "t": batch[tie_col]})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "cp_i": pa.array([], type=pa.int64()),
                          "d_stat": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        us = g["us"].to_numpy(zero_copy_only=False)
        vc = g["vc"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        n = len(k)
        o = np.lexsort((t, us, k))
        k, vc = k[o], vc[o]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        nseg = np.diff(np.r_[starts, n])
        seg = np.repeat(np.arange(len(starts)), nseg)
        cs = np.cumsum(vc)
        base = np.repeat(np.r_[0, cs[starts[1:] - 1]], nseg)
        s = cs - base                                  # per-key prefix
        stot = np.repeat(s[np.r_[starts[1:], n] - 1], nseg)
        nn = np.repeat(nseg.astype(np.int64), nseg)
        i = np.arange(n) - np.repeat(starts, nseg) + 1
        dd = np.abs(nn * s - i * stot)
        cand = i < nn                                  # split 1..n-1
        if not cand.any():
            return empty
        segc, ic, ddc, kc = seg[cand], i[cand], dd[cand], k[cand]
        o2 = np.lexsort((ic, -ddc, segc))
        first = np.flatnonzero(np.r_[True, segc[o2][1:] != segc[o2][:-1]])
        pick = o2[first]
        return pa.table({key_col: pa.array(kc[pick]),
                         "cp_i": pa.array(ic[pick]),
                         "d_stat": pa.array(ddc[pick])})

    narrow = ds.map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def theil_sen_per_key(ds, key_col: str, ts_col: str, val_col: str,
                      buckets: int | None = None):
    """Per-key Theil-Sen estimator (Theil 1950 / Sen 1968): the median
    of all pairwise slopes (v_j - v_i)/(t_j - t_i) over pairs with
    strictly increasing timestamps — the standard robust trend slope
    (50% breakdown point, vs least-squares' zero).

    Exact pairwise semantics (O(n^2) slopes per key — the estimator's
    own cost; the ripley/fuzzy-join precedent for inherently quadratic
    verify work), but NO per-key Python: ONE group_by_key_bucket
    shuffle, then a stride loop d = 1..max_run emitting all (i, i+d)
    same-key pairs of the whole bucket per step, and one lexsort +
    run-boundary gather for every key's median at once. Slopes divide
    exact integer cents by exact integer microseconds in double; the
    median interpolates as lo + (hi-lo)*0.5, bit-matching DuckDB's
    quantile_cont(0.5). Keys with no qualifying pair drop."""
    import numpy as np

    from ..blocks import group_by_key_bucket

    def pre(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.round(pc.multiply(batch[val_col], 100.0)) \
            .cast(pa.int64())
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({key_col: batch[key_col], "us": us, "vc": vc})

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=pa.int64()),
                          "ts_slope": pa.array([], type=pa.float64()),
                          "n_pairs": pa.array([], type=pa.int64())})
        if g.num_rows == 0:
            return empty
        k = g[key_col].to_numpy(zero_copy_only=False)
        us = g["us"].to_numpy(zero_copy_only=False)
        vc = g["vc"].to_numpy(zero_copy_only=False)
        n = len(k)
        o = np.lexsort((us, k))
        k, us, vc = k[o], us[o], vc[o]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        nseg = np.diff(np.r_[starts, n])
        seg = np.repeat(np.arange(len(starts)), nseg)
        max_m = int(nseg.max())
        sl_parts, seg_parts = [], []
        for d in range(1, max_m):
            i = np.arange(n - d)
            ok = (seg[i] == seg[i + d]) & (us[i + d] > us[i])
            if not ok.any():
                continue
            i = i[ok]
            dt = (us[i + d] - us[i]).astype(np.float64)
            dv = (vc[i + d] - vc[i]).astype(np.float64)
            sl_parts.append(dv / dt)
            seg_parts.append(seg[i])
        if not sl_parts:
            return empty
        sl = np.concatenate(sl_parts)
        sg = np.concatenate(seg_parts)
        o2 = np.lexsort((sl, sg))
        sl, sg = sl[o2], sg[o2]
        s2 = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
        sizes = np.diff(np.r_[s2, len(sg)])
        lo = sl[s2 + (sizes - 1) // 2]
        hi = sl[s2 + sizes // 2]
        med = lo + (hi - lo) * 0.5
        uk = k[starts][sg[s2]]
        return pa.table({key_col: pa.array(uk),
                         "ts_slope": pa.array(med),
                         "n_pairs": pa.array(sizes.astype(np.int64))})

    narrow = ds.select_columns([key_col, ts_col, val_col]) \
        .map_batches(pre, batch_format="pyarrow")
    return group_by_key_bucket(narrow, key_col, fold, buckets=buckets)


def ks_two_sample(ds, group_col: str, value_col: str,
                  scale: float = 100.0):
    """Exact two-sample Kolmogorov-Smirnov statistic of EVERY group vs
    the rest of the population: D = max over distinct values of
    |F_g - F_rest|, computed tie-correctly on the integer-scaled value
    (round(value*scale)) with the float deferred to ONE final division
    — d_num = max |cum_g * n_rest - cum_rest * n_g| is an exact int64,
    ks = d_num / (n_g * n_rest). The distribution-drift test a data
    pipeline runs per source/class (Massey 1951, public method).

    Scale shape: per-batch (value, group) partial counts collapse each
    block before ONE pivoted groupby Sum over distinct values; the
    cumulative scan is the global_rank discipline — sort by value,
    per-block local cumsums, per-block TOTALS (|groups| scalars per
    block) exclusive-scanned on the driver, stamped back; per-block D
    partials end in a ≤|groups| Max fold. No row set ever materializes
    on the driver."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..blocks import _remote_num_rows  # noqa: F401 (same module deps)
    from .analytics import pivot_counts

    # distinct groups (bounded: event classes / sources)
    groups = sorted(
        r[group_col]
        for r in ds.groupby(group_col).count().take_all())
    gcols = [f"n_{g}" for g in groups]

    def to_vc(batch: pa.Table) -> pa.Table:
        vc = np.rint(batch[value_col].to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        return pa.table({"vc": pa.array(vc),
                         group_col: batch[group_col]})

    counts = pivot_counts(ds.map_batches(to_vc, batch_format="pyarrow"),
                          "vc", group_col, groups)
    sorted_ds = counts.sort("vc").materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def block_totals(tbl: pa.Table):
        return np.asarray([tbl[c].to_numpy(zero_copy_only=False).sum()
                           for c in gcols], dtype=np.int64)

    totals = ray.get([block_totals.remote(r) for r in refs])
    if not totals:
        return rd.from_arrow(pa.table({
            group_col: pa.array([], type=pa.string()),
            "n_group": pa.array([], type=pa.int64()),
            "n_rest": pa.array([], type=pa.int64()),
            "d_num": pa.array([], type=pa.int64()),
            "ks": pa.array([], type=pa.float64())}))
    tot = np.vstack(totals)                      # blocks x groups
    offsets = np.vstack([np.zeros(tot.shape[1], dtype=np.int64),
                         np.cumsum(tot, axis=0)[:-1]])
    n_g = tot.sum(axis=0)                        # per-group totals
    n_all = int(n_g.sum())

    @ray.remote(num_cpus=0)
    def block_d(tbl: pa.Table, off: np.ndarray):
        if tbl.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "d_num": pa.array([], type=pa.int64())})
        cums = np.empty((tbl.num_rows, len(gcols)), dtype=np.int64)
        for k, c in enumerate(gcols):
            cums[:, k] = off[k] + np.cumsum(
                tbl[c].to_numpy(zero_copy_only=False))
        cum_all = cums.sum(axis=1)
        d = np.empty(len(gcols), dtype=np.int64)
        for k in range(len(gcols)):
            nrest = n_all - n_g[k]
            cum_rest = cum_all - cums[:, k]
            d[k] = np.abs(cums[:, k] * nrest
                          - cum_rest * n_g[k]).max()
        return pa.table({group_col: pa.array(list(map(str, groups)),
                                             type=pa.string()),
                         "d_num": pa.array(d)})

    parts = [block_d.remote(r, offsets[i]) for i, r in enumerate(refs)]
    agg = rd.from_arrow_refs(parts).groupby(group_col) \
        .aggregate(Max("d_num", alias_name="d_num"))
    ng_map = {str(g): int(n) for g, n in zip(groups, n_g)}

    def fin(batch: pa.Table) -> pa.Table:
        gs = batch[group_col].to_pylist()
        d = batch["d_num"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ngv = np.asarray([ng_map[g] for g in gs], dtype=np.int64)
        nrv = n_all - ngv
        return pa.table({
            group_col: pa.array(gs, type=pa.string()),
            "n_group": pa.array(ngv),
            "n_rest": pa.array(nrv),
            "d_num": pa.array(d),
            "ks": pa.array(d.astype(np.float64)
                           / (ngv.astype(np.float64)
                              * nrv.astype(np.float64)))})

    return agg.map_batches(fin, batch_format="pyarrow")
