"""Multi-table star-join analytics — the composition proof that the
engine's join/aggregate primitives assemble into a full TPC-H-Q5-shaped
pipeline (the reference has no multi-table surface; its closest shape is
add-locations-to-ways' N:1 enrichment join,
/root/reference/src/command_add_locations_to_ways.cpp:178-236, chained
with tags-count's grouped aggregate).

Scale shape (the classic distributed star join):
  * dimension tables (region, nation, customer, supplier) are broadcast
    ONCE via ray.put as dense numpy lookup arrays keyed by their integer
    keys — a nationkey fits int8, so even a planet-scale customer map is
    bytes-per-customer, and every map task reads the same object-store
    copy (never re-shipped per batch);
  * the two unbounded fact tables (lineitem x orders) meet in ONE
    hash-partitioned Dataset.join on the orderkey — narrow projections
    only (3 int64/int8 columns a side), never payload;
  * the post-join same-nation filter + revenue aggregate run map-side
    into a native groupby over at most |nation| keys.

Revenue is computed in integer 1e-4 currency units
(round(price*100) * (100 - round(discount*100))) so the distributed sum
is order-insensitive and bit-equal to the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _dense_map(keys: np.ndarray, vals: np.ndarray,
               fill: int = -1) -> np.ndarray:
    out = np.full(int(keys.max()) + 1, fill, dtype=np.int64)
    out[keys.astype(np.int64)] = vals.astype(np.int64)
    return out


def _lookup(dense: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """dense[keys] with out-of-range keys mapping to -1 (unknown)."""
    safe = np.minimum(keys, len(dense) - 1)
    return np.where((keys >= 0) & (keys < len(dense)), dense[safe], -1)


def region_revenue(lineitem, orders, customer: pa.Table, supplier: pa.Table,
                   nation: pa.Table, region: pa.Table, region_name: str,
                   date_lo: np.datetime64, date_hi: np.datetime64,
                   num_partitions: int = 8, broadcast_cap: int = 2_000_000):
    """TPC-H Q5 semantics: per-nation revenue from lineitems whose order
    was placed by a customer in `region_name` within [date_lo, date_hi),
    where the supplier is in the customer's nation.

    `lineitem` / `orders` are Datasets (unbounded facts); the four
    dimension tables are small pyarrow Tables broadcast as dense arrays.
    When the region+date-pruned orders side fits `broadcast_cap` rows it
    broadcasts as sorted (orderkey, nation) arrays and the fact folds in
    one pass with per-batch pre-agg — zero joins; past the cap the
    hash-partitioned Acero join takes over. Returns a Dataset of
    (n_name, revenue_c4:int64)."""
    import ray

    rkey = region.filter(
        pc.equal(region["r_name"], region_name))["r_regionkey"]
    region_keys = set(rkey.to_pylist())
    n_key = nation["n_nationkey"].to_numpy()
    nation_in_region = np.isin(
        nation["n_regionkey"].to_numpy(),
        np.fromiter(region_keys, dtype=np.int64, count=len(region_keys)))
    names = nation["n_name"].to_pylist()
    name_of = {int(k): names[i] for i, k in enumerate(n_key)}

    cust_nation = _dense_map(customer["c_custkey"].to_numpy(),
                             customer["c_nationkey"].to_numpy())
    supp_nation = _dense_map(supplier["s_suppkey"].to_numpy(),
                             supplier["s_nationkey"].to_numpy())
    in_region = _dense_map(n_key, nation_in_region.astype(np.int64), fill=0)
    maps_ref = ray.put((cust_nation, supp_nation, in_region))

    lo_us = np.int64(date_lo.astype("datetime64[us]").astype(np.int64))
    hi_us = np.int64(date_hi.astype("datetime64[us]").astype(np.int64))

    def orders_side(batch: pa.Table) -> pa.Table:
        cust_nation, _, in_region = ray.get(maps_ref)
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ts >= lo_us) & (ts < hi_us)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)[keep]
        c_nat = _lookup(cust_nation, ck)
        ok = _lookup(in_region, c_nat) == 1
        return pa.table({
            "o_orderkey": pa.array(
                batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep][ok]),
            "c_nation": pa.array(c_nat[ok]),
        })

    def lineitem_side(batch: pa.Table) -> pa.Table:
        _, supp_nation, in_region = ray.get(maps_ref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        s_nat = _lookup(supp_nation, sk)
        ok = _lookup(in_region, s_nat) == 1
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[ok]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[ok]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({
            "l_orderkey": pa.array(
                batch["l_orderkey"].to_numpy(zero_copy_only=False)[ok]),
            "s_nation": pa.array(s_nat[ok]),
            "rev_c4": pa.array(rev),
        })

    from ray.data.aggregate import Sum

    o_proj = orders.map_batches(orders_side, batch_format="pyarrow") \
        .materialize()
    n_orders = o_proj.count()
    # fully-empty join sides crash Acero (CLAUDE.md landmine); at sf0
    # fall out early with the output schema intact
    if n_orders == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "n_name": pa.array([], type=pa.string()),
            "revenue_c4": pa.array([], type=pa.int64())}))

    if n_orders <= broadcast_cap:
        # region+date pruning typically leaves a SMALL orders side —
        # broadcast (orderkey -> c_nation) as sorted arrays and fold the
        # fact in ONE pass with per-batch (nation, rev) pre-agg; no
        # all-to-all join at all (the engine's broadcast-small-sides
        # doctrine). The Acero join below remains the scale path.
        rows = o_proj.take_all()
        ok_arr = np.asarray([r["o_orderkey"] for r in rows], dtype=np.int64)
        cn_arr = np.asarray([r["c_nation"] for r in rows], dtype=np.int64)
        order = np.argsort(ok_arr, kind="stable")
        omap_ref = ray.put((ok_arr[order], cn_arr[order]))

        def fold(batch: pa.Table) -> pa.Table:
            okeys, cnats = ray.get(omap_ref)
            t = lineitem_side(batch)
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, lk)
            pos_c = np.minimum(pos, len(okeys) - 1)
            hit = (pos < len(okeys)) & (okeys[pos_c] == lk)
            same = hit & (cnats[pos_c]
                          == t["s_nation"].to_numpy(zero_copy_only=False))
            nat = t["s_nation"].to_numpy(zero_copy_only=False)[same]
            rev = t["rev_c4"].to_numpy(zero_copy_only=False)[same]
            un, inv = np.unique(nat, return_inverse=True)
            return pa.table({
                "nation": pa.array(un.astype(np.int64)),
                "rev_c4": pa.array(np.bincount(inv, weights=rev)
                                   .astype(np.int64)),
            })

        agg = lineitem.map_batches(fold, batch_format="pyarrow") \
            .groupby("nation").aggregate(Sum("rev_c4",
                                             alias_name="revenue_c4"))

        def finish(batch: pa.Table) -> pa.Table:
            nk = batch["nation"].to_pylist()
            return pa.table({
                "n_name": pa.array([name_of[int(k)] for k in nk],
                                   type=pa.string()),
                "revenue_c4": batch["revenue_c4"].cast(pa.int64()),
            })

        return agg.map_batches(finish, batch_format="pyarrow")

    l_proj = lineitem.map_batches(lineitem_side, batch_format="pyarrow") \
        .materialize()
    if l_proj.count() == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "n_name": pa.array([], type=pa.string()),
            "revenue_c4": pa.array([], type=pa.int64())}))

    joined = l_proj.join(o_proj, join_type="inner",
                         num_partitions=num_partitions,
                         on=("l_orderkey",), right_on=("o_orderkey",))

    def same_nation(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["s_nation"], batch["c_nation"])
        kept = batch.filter(keep)
        return pa.table({"nation": kept["s_nation"],
                         "rev_c4": kept["rev_c4"]})

    agg = joined.map_batches(same_nation, batch_format="pyarrow") \
        .groupby("nation").aggregate(Sum("rev_c4", alias_name="revenue_c4"))

    def finish(batch: pa.Table) -> pa.Table:
        nk = batch["nation"].to_pylist()
        return pa.table({
            "n_name": pa.array([name_of[int(k)] for k in nk],
                               type=pa.string()),
            "revenue_c4": batch["revenue_c4"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def rollup_counts(ds, dims: list[str], value_col: str,
                  all_marker: str = "ALL"):
    """GROUPING SETS / ROLLUP aggregate: one native groupby per prefix of
    `dims` ((d1..dk), (d1..dk-1), ..., ()) unioned with `all_marker`
    filling the rolled-up dimensions. Each level is its own partial+final
    combine over an ever-smaller key space, so the extra levels cost a
    fraction of the base aggregate; the union is lazy (no barrier).

    Returns (dims..., n:int64, total:int64) with string dims."""
    from ray.data.aggregate import Count, Sum

    def level(keys: list[str]):
        if keys:
            agg = ds.groupby(keys).aggregate(
                Count(alias_name="n"), Sum(value_col, alias_name="total"))
        else:
            agg = ds.groupby(None).aggregate(
                Count(alias_name="n"), Sum(value_col, alias_name="total"))

        def fin(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for d in dims:
                cols[d] = (batch[d].cast(pa.string()) if d in keys
                           else pa.array([all_marker] * n, type=pa.string()))
            cols["n"] = batch["n"].cast(pa.int64())
            cols["total"] = batch["total"].cast(pa.int64())
            return pa.table(cols)

        return agg.map_batches(fin, batch_format="pyarrow")

    out = level(list(dims))
    for k in range(len(dims) - 1, -1, -1):
        out = out.union(level(list(dims[:k])))
    return out


def pivot_counts(ds, key_col: str, cat_col: str, categories: list[str]):
    """Wide (pivoted) aggregate: one output row per key with an `n_<cat>`
    int64 count column per category. Map-side one-hot columns + ONE
    native groupby with a Sum per category — Ray's hash aggregate
    pre-combines per block, so the shuffle carries at most
    keys x blocks partial rows, never the event stream."""
    from ray.data.aggregate import Sum

    def one_hot(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        for c in categories:
            cols[f"n_{c}"] = pc.equal(batch[cat_col], c).cast(pa.int64())
        return pa.table(cols)

    hot = ds.map_batches(one_hot, batch_format="pyarrow")
    agg = hot.groupby(key_col).aggregate(
        *[Sum(f"n_{c}", alias_name=f"n_{c}") for c in categories])

    def fin(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        for c in categories:
            cols[f"n_{c}"] = batch[f"n_{c}"].cast(pa.int64())
        return pa.table(cols)

    return agg.map_batches(fin, batch_format="pyarrow")


def trend_per_key(ds, key_col: str, x_col: str, y_col: str):
    """Exact per-key least-squares trend: emits the slope of y over x as
    an integer RATIONAL (numerator, denominator) so the distributed
    result is bit-exact — slope = num/den with
    num = n*Σxy - Σx*Σy, den = n*Σx² - (Σx)². The grouped-regression
    operator a curation pipeline uses for per-source quality drift;
    nearest reference relative is tags-count's grouped aggregate
    (/root/reference/src/command_tags_count.cpp:169-217).

    Scale shape: ONE native groupby over map-side-derived moment columns
    (x, y, xy, x²) — Ray's hash aggregate does the partial+final
    combine, so shuffle volume is 5 int64 per row regardless of
    payload. Finalization is per-key scalar arithmetic in a map task.
    int64 bound: |num| ≤ n²·max|x|·max|y| — callers keep x RELATIVE
    (e.g. hours since corpus start) so n up to ~1e6 rows/key is safe.

    Returns (key, n:int64, slope_num:int64, slope_den:int64)."""
    from ray.data.aggregate import Count, Sum

    def moments(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key_col: batch[key_col],
                         "_x": pa.array(x), "_y": pa.array(y),
                         "_xy": pa.array(x * y), "_x2": pa.array(x * x)})

    agg = ds.map_batches(moments, batch_format="pyarrow") \
        .groupby(key_col).aggregate(
            Count(alias_name="n"),
            Sum("_x", alias_name="_sx"), Sum("_y", alias_name="_sy"),
            Sum("_xy", alias_name="_sxy"), Sum("_x2", alias_name="_sx2"))

    def fin(batch: pa.Table) -> pa.Table:
        n = batch["n"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sx = batch["_sx"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sy = batch["_sy"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sxy = batch["_sxy"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sx2 = batch["_sx2"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: batch[key_col],
            "n": pa.array(n),
            "slope_num": pa.array(n * sxy - sx * sy),
            "slope_den": pa.array(n * sx2 - sx * sx),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def cube_counts(ds, dims: list[str], value_col: str,
                all_marker: str = "ALL"):
    """GROUP BY CUBE over `dims` in ONE shuffle: each batch first
    pre-aggregates per full dim tuple (lexsort + run-length — the
    map-side combiner), then every partial row explodes into all 2^d
    masked grouping-set combinations with `all_marker` filling masked
    dims, and a single native groupby Sums the lattice. Contrast
    rollup_counts (one groupby per level): the cube pays 2^d x
    PRE-AGGREGATED rows through one exchange instead of d+1 full-input
    exchanges — the right trade whenever batches compress well on the
    dims (low-cardinality dims always do).

    Returns (dims..., n:int64, total:int64) with string dims."""
    from ray.data.aggregate import Sum

    d = len(dims)
    masks = [[(m >> i) & 1 for i in range(d)] for m in range(1 << d)]

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({**{c: pa.array([], type=pa.string())
                                for c in dims},
                             "_n": pa.array([], type=pa.int64()),
                             "_t": pa.array([], type=pa.int64())})
        keys = [np.asarray(batch[c].to_pylist(), dtype=str) for c in dims]
        val = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort(tuple(reversed(keys)))
        ks = [k[order] for k in keys]
        new = np.zeros(len(val), dtype=bool)
        new[0] = True
        for k in ks:
            new[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        n_part = np.diff(np.append(starts, len(val))).astype(np.int64)
        t_part = np.add.reduceat(val[order], starts)
        reps = []
        for mask in masks:
            cols = {}
            for i, c in enumerate(dims):
                cols[c] = (pa.array(ks[i][starts], type=pa.string())
                           if mask[i] else
                           pa.array([all_marker] * len(starts),
                                    type=pa.string()))
            cols["_n"] = pa.array(n_part)
            cols["_t"] = pa.array(t_part)
            reps.append(pa.table(cols))
        return pa.concat_tables(reps)

    agg = ds.select_columns(list(dims) + [value_col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby(list(dims)).aggregate(
            Sum("_n", alias_name="n"), Sum("_t", alias_name="total"))

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({**{c: batch[c].cast(pa.string()) for c in dims},
                         "n": batch["n"].cast(pa.int64()),
                         "total": batch["total"].cast(pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def pricing_summary(lineitem, cutoff_date: str = "1998-09-01"):
    """TPC-H Q1-shaped pricing summary — per (returnflag, linestatus)
    row counts, quantity and price sums, the discounted and
    discounted+taxed totals, and the average quantity. The fileinfo
    multi-agg shape (reference src/command_fileinfo.cpp's per-type
    CRC/count block) applied to the fact table.

    Exactness discipline: prices/discounts/taxes are 2-decimal, so the
    money math runs in INTEGER cents — disc = ep_c * (100 - d_c2),
    charge = disc * (100 + t_c2) — folded through per-batch Arrow
    group_by pre-aggregation then ONE tiny native-Sum groupby (the
    partial/combiner shape: the shuffle carries <= 6 rows per batch).
    avg_qty is one float64 division of exact ints, mirrored in SQL."""
    from ray.data.aggregate import Sum

    def pre(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.timestamp("us"))
        keep = pc.less_equal(
            ship, pa.scalar(np.datetime64(cutoff_date + "T00:00:00",
                                          "us")))
        batch = batch.filter(keep)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        tx = batch["l_tax"].to_numpy(zero_copy_only=False)
        ep_c = np.round(ep * 100).astype(np.int64)
        d2 = np.round(dc * 100).astype(np.int64)
        t2 = np.round(tx * 100).astype(np.int64)
        disc = ep_c * (100 - d2)
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "_n": pa.array(np.ones(batch.num_rows, np.int64)),
            "_q": pa.array(qty.astype(np.int64)),
            "_b": pa.array(ep_c),
            "_d": pa.array(disc),
            "_c": pa.array(disc * (100 + t2)),
        })
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("_n", "sum"), ("_q", "sum"), ("_b", "sum"),
             ("_d", "sum"), ("_c", "sum")])

    agg = lineitem.map_batches(pre, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("_n_sum", alias_name="n"),
            Sum("_q_sum", alias_name="sum_qty"),
            Sum("_b_sum", alias_name="sum_base_c"),
            Sum("_d_sum", alias_name="sum_disc_c4"),
            Sum("_c_sum", alias_name="sum_charge_c6"))

    def fin(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sq = batch["sum_qty"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "n": pa.array(n),
            "sum_qty": pa.array(sq),
            "sum_base_c": batch["sum_base_c"].cast(pa.int64()),
            "sum_disc_c4": batch["sum_disc_c4"].cast(pa.int64()),
            "sum_charge_c6": batch["sum_charge_c6"].cast(pa.int64()),
            "avg_qty": pa.array(sq / n, type=pa.float64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def shipping_priority(lineitem, orders, customer: pa.Table,
                      segment: str, cutoff: np.datetime64, k: int = 10,
                      num_partitions: int = 8,
                      broadcast_cap: int = 2_000_000):
    """TPC-H Q3 semantics: the k unshipped orders (placed before
    `cutoff` by a `segment` customer, with lineitems shipping after it)
    with the highest outstanding revenue — GROUP BY l_orderkey,
    o_orderdate, o_orderpriority, ORDER BY revenue DESC, o_orderdate,
    l_orderkey LIMIT k (the extra l_orderkey tiebreak makes the top-k
    deterministic; revenue in exact integer 1e-4 units, the
    region_revenue convention).

    Scale shape mirrors region_revenue: the segment membership is a
    broadcast dense bitmap; the segment+date-pruned orders side under
    `broadcast_cap` broadcasts as sorted (orderkey, date, priority)
    arrays and the lineitem fact folds in ONE pass with per-batch
    per-orderkey pre-agg (zero joins); past the cap the hash-partitioned
    Dataset.join takes over. The final sort runs on the tiny
    (qualifying orders) aggregate, then limit(k)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    seg_cust = customer.filter(
        pc.equal(customer["c_mktsegment"], segment))["c_custkey"] \
        .to_numpy()
    in_seg = _dense_map(seg_cust, np.ones(len(seg_cust), dtype=np.int64),
                        fill=0)
    seg_ref = ray.put(in_seg)
    cut_us = np.int64(cutoff.astype("datetime64[us]").astype(np.int64))

    empty = pa.table({"l_orderkey": pa.array([], type=pa.int64()),
                      "revenue_c4": pa.array([], type=pa.int64()),
                      "o_orderdate": pa.array(
                          [], type=pa.timestamp("us")),
                      "o_orderpriority": pa.array([], type=pa.string())})

    def orders_side(batch: pa.Table) -> pa.Table:
        seg = ray.get(seg_ref)
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        keep = (ts < cut_us) & (_lookup(seg, ck) == 1)
        return pa.table({
            "o_orderkey": pa.array(
                batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
            "odate_us": pa.array(ts[keep]),
            "o_orderpriority": pa.array(
                np.asarray(batch["o_orderpriority"].to_pylist(),
                           dtype=object)[keep].tolist(),
                type=pa.string()),
        })

    def lineitem_side(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ts > cut_us
        price = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({
            "l_orderkey": pa.array(
                batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
            "rev_c4": pa.array(rev),
        })

    def finish_sorted(agg):
        def fin(batch: pa.Table) -> pa.Table:
            return pa.table({
                "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
                "revenue_c4": batch["revenue_c4"].cast(pa.int64()),
                "o_orderdate": batch["odate_us"].cast(pa.int64())
                    .cast(pa.timestamp("us")),
                "o_orderpriority": batch["o_orderpriority"].cast(pa.string()),
            })

        return agg.sort(["revenue_c4", "odate_us", "l_orderkey"],
                        descending=[True, False, False]).limit(k) \
            .map_batches(fin, batch_format="pyarrow")

    o_proj = orders.map_batches(orders_side,
                                batch_format="pyarrow").materialize()
    n_orders = o_proj.count()
    if n_orders == 0:
        return rd.from_arrow(empty)

    if n_orders <= broadcast_cap:
        rows = o_proj.take_all()
        ok_arr = np.asarray([r["o_orderkey"] for r in rows],
                            dtype=np.int64)
        od_arr = np.asarray([r["odate_us"] for r in rows], dtype=np.int64)
        sp_arr = np.asarray([r["o_orderpriority"] for r in rows],
                            dtype=object)
        order = np.argsort(ok_arr, kind="stable")
        omap_ref = ray.put((ok_arr[order], od_arr[order], sp_arr[order]))

        def fold(batch: pa.Table) -> pa.Table:
            okeys, odates, oprios = ray.get(omap_ref)
            t = lineitem_side(batch)
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, lk)
            pos_c = np.minimum(pos, len(okeys) - 1)
            hit = (pos < len(okeys)) & (okeys[pos_c] == lk)
            lk = lk[hit]
            rev = t["rev_c4"].to_numpy(zero_copy_only=False)[hit]
            p = pos_c[hit]
            un, inv = np.unique(lk, return_inverse=True)
            first = np.zeros(len(un), dtype=np.int64)
            first[inv] = p                       # any hit of the key
            return pa.table({
                "l_orderkey": pa.array(un),
                "rev_c4": pa.array(np.bincount(inv, weights=rev)
                                   .astype(np.int64)),
                "odate_us": pa.array(odates[first]),
                "o_orderpriority": pa.array(oprios[first].tolist(),
                                            type=pa.string()),
            })

        agg = lineitem.map_batches(fold, batch_format="pyarrow") \
            .groupby(["l_orderkey", "odate_us", "o_orderpriority"]) \
            .aggregate(Sum("rev_c4", alias_name="revenue_c4"))
        return finish_sorted(agg)

    l_proj = lineitem.map_batches(lineitem_side,
                                  batch_format="pyarrow").materialize()
    if l_proj.count() == 0:
        return rd.from_arrow(empty)
    joined = l_proj.join(o_proj, join_type="inner",
                         num_partitions=num_partitions,
                         on=("l_orderkey",), right_on=("o_orderkey",))
    agg = joined.groupby(["l_orderkey", "odate_us", "o_orderpriority"]) \
        .aggregate(Sum("rev_c4", alias_name="revenue_c4"))
    return finish_sorted(agg)


def returned_revenue(lineitem, orders, customer: pa.Table,
                     nation: pa.Table, date_lo: np.datetime64,
                     date_hi: np.datetime64, k: int = 20,
                     num_partitions: int = 8,
                     broadcast_cap: int = 2_000_000):
    """TPC-H Q10 semantics: the k customers who lost the most revenue to
    RETURNED items (l_returnflag = 'R') on orders placed in
    [date_lo, date_hi) — GROUP BY customer, ORDER BY revenue DESC,
    c_custkey LIMIT k, revenue in exact integer 1e-4 units (the
    region_revenue convention; c_name / n_name attached from the
    driver-resident dimension tables).

    Scale shape mirrors region_revenue / shipping_priority: the
    date-pruned orders side broadcasts as sorted (orderkey, custkey)
    arrays under `broadcast_cap` and the returned-lineitem fact folds in
    ONE pass with per-batch per-custkey pre-agg (zero joins); past the
    cap the hash-partitioned Dataset.join takes over. The final sort +
    limit runs on the per-customer aggregate (bounded by |customers|)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo_us = np.int64(date_lo.astype("datetime64[us]").astype(np.int64))
    hi_us = np.int64(date_hi.astype("datetime64[us]").astype(np.int64))

    def orders_side(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ts >= lo_us) & (ts < hi_us)
        return pa.table({
            "o_orderkey": pa.array(
                batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
            "o_custkey": pa.array(
                batch["o_custkey"].to_numpy(zero_copy_only=False)[keep])})

    def lineitem_side(batch: pa.Table) -> pa.Table:
        flag = batch["l_returnflag"].to_numpy(zero_copy_only=False) \
            .astype(str)
        ok = flag == "R"
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[ok]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[ok]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({
            "l_orderkey": pa.array(
                batch["l_orderkey"].to_numpy(zero_copy_only=False)[ok]),
            "rev_c4": pa.array(rev)})

    empty = pa.table({"c_custkey": pa.array([], type=pa.int64()),
                      "c_name": pa.array([], type=pa.string()),
                      "n_name": pa.array([], type=pa.string()),
                      "revenue_c4": pa.array([], type=pa.int64())})

    o_proj = orders.map_batches(orders_side,
                                batch_format="pyarrow").materialize()
    n_orders = o_proj.count()
    if n_orders == 0:
        return rd.from_arrow(empty)

    if n_orders <= broadcast_cap:
        rows = o_proj.take_all()
        ok_arr = np.asarray([r["o_orderkey"] for r in rows],
                            dtype=np.int64)
        ck_arr = np.asarray([r["o_custkey"] for r in rows],
                            dtype=np.int64)
        order = np.argsort(ok_arr, kind="stable")
        omap_ref = ray.put((ok_arr[order], ck_arr[order]))

        def fold(batch: pa.Table) -> pa.Table:
            okeys, custs = ray.get(omap_ref)
            t = lineitem_side(batch)
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, lk)
            pos_c = np.minimum(pos, len(okeys) - 1)
            hit = (pos < len(okeys)) & (okeys[pos_c] == lk)
            ck = custs[pos_c][hit]
            rev = t["rev_c4"].to_numpy(zero_copy_only=False)[hit]
            un, inv = np.unique(ck, return_inverse=True)
            return pa.table({
                "c_custkey": pa.array(un.astype(np.int64)),
                "rev_c4": pa.array(np.bincount(inv, weights=rev)
                                   .astype(np.int64))})

        agg = lineitem.map_batches(fold, batch_format="pyarrow") \
            .groupby("c_custkey").aggregate(
                Sum("rev_c4", alias_name="revenue_c4"))
    else:
        l_proj = lineitem.map_batches(lineitem_side,
                                      batch_format="pyarrow") \
            .materialize()
        if l_proj.count() == 0:
            return rd.from_arrow(empty)
        joined = l_proj.join(o_proj, join_type="inner",
                             num_partitions=num_partitions,
                             on=("l_orderkey",),
                             right_on=("o_orderkey",))
        agg = joined.map_batches(
            lambda b: pa.table({"c_custkey": b["o_custkey"]
                                .cast(pa.int64()),
                                "rev_c4": b["rev_c4"].cast(pa.int64())}),
            batch_format="pyarrow") \
            .groupby("c_custkey").aggregate(
                Sum("rev_c4", alias_name="revenue_c4"))

    cname = dict(zip(customer["c_custkey"].to_pylist(),
                     customer["c_name"].to_pylist()))
    cnat = dict(zip(customer["c_custkey"].to_pylist(),
                    customer["c_nationkey"].to_pylist()))
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    names_ref = ray.put((cname, cnat, nname))

    top = agg.sort(["revenue_c4", "c_custkey"],
                   descending=[True, False]).limit(k)

    def finish(batch: pa.Table) -> pa.Table:
        cn, cnk, nn = ray.get(names_ref)
        ck = batch["c_custkey"].to_pylist()
        return pa.table({
            "c_custkey": batch["c_custkey"].cast(pa.int64()),
            "c_name": pa.array([cn[int(c)] for c in ck],
                               type=pa.string()),
            "n_name": pa.array([nn[int(cnk[int(c)])] for c in ck],
                               type=pa.string()),
            "revenue_c4": batch["revenue_c4"].cast(pa.int64())})

    return top.map_batches(finish, batch_format="pyarrow")


def late_order_priority(lineitem, orders, date_lo: np.datetime64,
                        date_hi: np.datetime64, late_days: int = 60,
                        num_partitions: int = 8,
                        broadcast_cap: int = 2_000_000):
    """TPC-H Q4 shape (adapted to the sandbox schema, which has no
    l_commitdate/l_receiptdate): per order priority, how many orders
    placed in [date_lo, date_hi) have at least ONE line shipped more
    than `late_days` days after the order date — the EXISTS semi-join
    shape (reference analogue: getid's existence semantics over refs,
    /root/reference/src/command_getid.cpp:250-285).

    Scale shape: the lineitem fact is pre-aggregated map-side to ONE row
    per (orderkey-in-batch): its max ship timestamp — EXISTS(any line
    late) ≡ max(l_shipdate) late, so the semi-join never carries
    per-line rows. Under `broadcast_cap` the date-pruned orders side
    broadcasts as sorted (orderkey, odate, priority-code) arrays and
    lateness folds per batch with zero joins; past the cap the
    per-order max-ship aggregate hash-joins the orders projection.
    Both paths end in a ≤|priorities| native groupby."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    lo_us = np.int64(date_lo.astype("datetime64[us]").astype(np.int64))
    hi_us = np.int64(date_hi.astype("datetime64[us]").astype(np.int64))
    late_us = np.int64(late_days) * np.int64(86_400_000_000)

    empty = pa.table({"o_orderpriority": pa.array([], type=pa.string()),
                      "order_count": pa.array([], type=pa.int64())})

    def orders_side(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ts >= lo_us) & (ts < hi_us)
        return pa.table({
            "o_orderkey": pa.array(
                batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep]),
            "odate_us": pa.array(ts[keep]),
            "o_orderpriority": pa.array(
                np.asarray(batch["o_orderpriority"].to_pylist(),
                           dtype=object)[keep].tolist(),
                type=pa.string())})

    def line_maxship(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        un, inv = np.unique(lk, return_inverse=True)
        mx = np.full(len(un), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table({"l_orderkey": pa.array(un.astype(np.int64)),
                         "ship_us": pa.array(mx)})

    def count_prios(tagged):
        agg = tagged.groupby("o_orderpriority") \
            .aggregate(Count(alias_name="order_count"))
        return agg.map_batches(
            lambda b: pa.table({
                "o_orderpriority": b["o_orderpriority"].cast(pa.string()),
                "order_count": b["order_count"].cast(pa.int64())}),
            batch_format="pyarrow")

    o_proj = orders.map_batches(orders_side,
                                batch_format="pyarrow").materialize()
    n_orders = o_proj.count()
    if n_orders == 0:
        return rd.from_arrow(empty)

    if n_orders <= broadcast_cap:
        rows = o_proj.take_all()
        ok_arr = np.asarray([r["o_orderkey"] for r in rows],
                            dtype=np.int64)
        od_arr = np.asarray([r["odate_us"] for r in rows], dtype=np.int64)
        pr_arr = np.asarray([r["o_orderpriority"] for r in rows],
                            dtype=object)
        order = np.argsort(ok_arr, kind="stable")
        omap_ref = ray.put((ok_arr[order], od_arr[order], pr_arr[order]))

        def fold(batch: pa.Table) -> pa.Table:
            okeys, odates, oprios = ray.get(omap_ref)
            t = line_maxship(batch)
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
            sh = t["ship_us"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, lk)
            pos_c = np.minimum(pos, max(len(okeys) - 1, 0))
            hit = (pos < len(okeys)) & (okeys[pos_c] == lk) \
                & (sh > odates[pos_c] + late_us)
            return pa.table({
                "o_orderkey": pa.array(lk[hit]),
                "ship_us": pa.array(sh[hit]),
                "o_orderpriority": pa.array(
                    oprios[pos_c[hit]].tolist(), type=pa.string())})

        # dedup late orders across batches (an order's lines span blocks)
        late = lineitem.map_batches(fold, batch_format="pyarrow") \
            .groupby("o_orderkey") \
            .aggregate(Max("o_orderpriority", alias_name="o_orderpriority"))
        return count_prios(late)

    l_agg = lineitem.map_batches(line_maxship, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Max("ship_us",
                                             alias_name="ship_us"))
    joined = l_agg.join(o_proj, join_type="inner",
                        num_partitions=num_partitions,
                        on=("l_orderkey",), right_on=("o_orderkey",))

    def late_filter(batch: pa.Table) -> pa.Table:
        sh = batch["ship_us"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        od = batch["odate_us"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = sh > od + late_us
        return pa.table({
            "o_orderpriority": pa.array(
                np.asarray(batch["o_orderpriority"].to_pylist(),
                           dtype=object)[keep].tolist(),
                type=pa.string())})

    return count_prios(joined.map_batches(late_filter,
                                          batch_format="pyarrow"))


def promo_revenue(lineitem, part: pa.Table, date_lo: np.datetime64,
                  date_hi: np.datetime64, promo_type: str = "PROMO"):
    """TPC-H Q14 semantics: the share of revenue from promo-type parts
    among lines shipped in [date_lo, date_hi) — promo_pct =
    100 * promo_revenue / total_revenue (revenue in exact integer 1e-4
    units; the single float division is evaluated in ONE fixed order so
    it bit-matches the oracle's `100.0 * p / t`).

    Scale shape: the part dimension broadcasts ONCE as a dense promo
    bitmap keyed by partkey (bytes per part); the lineitem fact folds
    map-side to a singleton (promo_c4, total_c4) partial per batch and
    ONE constant-size Sum reduce finishes — no shuffle wider than the
    partial rows (the forecast_revenue / fileinfo single-row shape)."""
    import ray
    from ray.data.aggregate import Sum

    lo_us = np.int64(date_lo.astype("datetime64[us]").astype(np.int64))
    hi_us = np.int64(date_hi.astype("datetime64[us]").astype(np.int64))
    pk = part["p_partkey"].to_numpy()
    is_promo = (np.asarray(part["p_type"].to_pylist(), dtype=object)
                == promo_type).astype(np.int64)
    promo_ref = ray.put(_dense_map(pk, is_promo, fill=0))

    def partial(batch: pa.Table) -> pa.Table:
        promo = ray.get(promo_ref)
        ts = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ts >= lo_us) & (ts < hi_us)
        price = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        pkey = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * (100 - np.rint(disc * 100.0).astype(np.int64)))
        flag = _lookup(promo, pkey)
        return pa.table({
            "_k": pa.array([0], type=pa.int64()),
            "promo_c4": pa.array([np.int64((rev * flag).sum())]),
            "total_c4": pa.array([np.int64(rev.sum())])})

    agg = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("promo_c4", alias_name="promo_c4"),
                                 Sum("total_c4", alias_name="total_c4"))

    def finish(batch: pa.Table) -> pa.Table:
        p = batch["promo_c4"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = batch["total_c4"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pct = 100.0 * p.astype(np.float64) / t.astype(np.float64)
        return pa.table({"promo_c4": pa.array(p), "total_c4": pa.array(t),
                         "promo_pct": pa.array(pct)})

    return agg.map_batches(finish, batch_format="pyarrow")


def large_orders(lineitem, orders, customer: pa.Table,
                 qty_threshold: int = 150, k: int = 100,
                 num_partitions: int = 8,
                 survivor_cap: int = 2_000_000):
    """TPC-H Q18 semantics: the k largest orders by total line quantity
    above `qty_threshold` — GROUP BY order HAVING SUM(qty) > T, join
    back to orders for the customer/date/price, ORDER BY sum_qty DESC,
    o_orderkey LIMIT k (deterministic tiebreak; quantities are whole
    numbers so the sum is exact int64).

    Scale shape: lineitem pre-aggregates per batch (unique orderkeys x
    bincount) then ONE native groupby Sum; the HAVING filter runs
    map-side on the aggregate, so only survivor orders (output-bounded
    by the threshold's selectivity) move further. Under `survivor_cap`
    the survivors broadcast as sorted (orderkey, qty) arrays and the
    orders fact folds with zero joins; past it a hash-partitioned
    Dataset.join takes over. Names attach from the driver-resident
    customer dim after the limit(k)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    empty = pa.table({"c_custkey": pa.array([], type=pa.int64()),
                      "c_name": pa.array([], type=pa.string()),
                      "o_orderkey": pa.array([], type=pa.int64()),
                      "o_orderdate": pa.array([], type=pa.timestamp("us")),
                      "total_price_c": pa.array([], type=pa.int64()),
                      "sum_qty": pa.array([], type=pa.int64())})

    def qty_partial(batch: pa.Table) -> pa.Table:
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        q = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        un, inv = np.unique(lk, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(un.astype(np.int64)),
            "qty": pa.array(np.bincount(inv, weights=q)
                            .astype(np.int64))})

    thresh = np.int64(qty_threshold)

    def having(batch: pa.Table) -> pa.Table:
        q = batch["sum_qty"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = q > thresh
        return pa.table({
            "l_orderkey": pa.array(batch["l_orderkey"].cast(pa.int64())
                                   .to_numpy(zero_copy_only=False)[keep]),
            "sum_qty": pa.array(q[keep])})

    survivors = lineitem.map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("qty", alias_name="sum_qty")) \
        .map_batches(having, batch_format="pyarrow").materialize()
    n_surv = survivors.count()
    if n_surv == 0:
        return rd.from_arrow(empty)

    def orders_cols(batch: pa.Table):
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        price = np.rint(batch["o_totalprice"]
                        .to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return ts, price

    if n_surv <= survivor_cap:
        rows = survivors.take_all()
        sk = np.asarray([r["l_orderkey"] for r in rows], dtype=np.int64)
        sq = np.asarray([r["sum_qty"] for r in rows], dtype=np.int64)
        order = np.argsort(sk, kind="stable")
        surv_ref = ray.put((sk[order], sq[order]))

        def fold(batch: pa.Table) -> pa.Table:
            skeys, sqty = ray.get(surv_ref)
            ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(skeys, ok)
            pos_c = np.minimum(pos, max(len(skeys) - 1, 0))
            hit = (pos < len(skeys)) & (skeys[pos_c] == ok)
            ts, price = orders_cols(batch)
            return pa.table({
                "o_orderkey": pa.array(ok[hit]),
                "o_custkey": pa.array(
                    batch["o_custkey"].to_numpy(zero_copy_only=False)[hit]),
                "odate_us": pa.array(ts[hit]),
                "total_price_c": pa.array(price[hit]),
                "sum_qty": pa.array(sqty[pos_c[hit]])})

        tagged = orders.map_batches(fold, batch_format="pyarrow")
    else:
        def orders_proj(batch: pa.Table) -> pa.Table:
            ts, price = orders_cols(batch)
            return pa.table({
                "o_orderkey": pa.array(
                    batch["o_orderkey"].to_numpy(zero_copy_only=False)),
                "o_custkey": pa.array(
                    batch["o_custkey"].to_numpy(zero_copy_only=False)),
                "odate_us": pa.array(ts),
                "total_price_c": pa.array(price)})

        o_proj = orders.map_batches(orders_proj,
                                    batch_format="pyarrow").materialize()
        tagged = survivors.join(o_proj, join_type="inner",
                                num_partitions=num_partitions,
                                on=("l_orderkey",),
                                right_on=("o_orderkey",)) \
            .map_batches(
                lambda b: pa.table({
                    "o_orderkey": b["l_orderkey"].cast(pa.int64()),
                    "o_custkey": b["o_custkey"].cast(pa.int64()),
                    "odate_us": b["odate_us"].cast(pa.int64()),
                    "total_price_c": b["total_price_c"].cast(pa.int64()),
                    "sum_qty": b["sum_qty"].cast(pa.int64())}),
                batch_format="pyarrow")

    cname = dict(zip(customer["c_custkey"].to_pylist(),
                     customer["c_name"].to_pylist()))
    names_ref = ray.put(cname)

    top = tagged.sort(["sum_qty", "o_orderkey"],
                      descending=[True, False]).limit(k)

    def finish(batch: pa.Table) -> pa.Table:
        cn = ray.get(names_ref)
        ck = batch["o_custkey"].to_pylist()
        return pa.table({
            "c_custkey": batch["o_custkey"].cast(pa.int64()),
            "c_name": pa.array([cn[int(c)] for c in ck],
                               type=pa.string()),
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "o_orderdate": batch["odate_us"].cast(pa.int64())
                .cast(pa.timestamp("us")),
            "total_price_c": batch["total_price_c"].cast(pa.int64()),
            "sum_qty": batch["sum_qty"].cast(pa.int64())})

    return top.map_batches(finish, batch_format="pyarrow")


def dormant_customers(customer, orders, cutoff: np.datetime64,
                      num_partitions: int = 8,
                      broadcast_cap: int = 4_000_000):
    """TPC-H Q22 shape (adapted: every sandbox customer has orders, so
    "never ordered" becomes "no order since `cutoff`"): per nation, the
    count and total balance of customers whose account balance is above
    the global positive-balance average AND who placed no order on/after
    the cutoff — the anti-join + broadcast-global-scalar shape
    (reference analogue: removeid's anti-join,
    /root/reference/src/command_removeid.cpp:143-177).

    Scale shape: the global average is a constant-size (sum, count)
    Sum fold; the above-average test cross-multiplies integers
    (bal_c * n > total_c) so no float threshold leaks in. Active
    custkeys since the cutoff come from a per-batch-unique +
    native-groupby distinct; under `broadcast_cap` they broadcast
    sorted and the customer fact anti-folds per batch with zero
    joins, ending in a ≤|nation| groupby; past the cap a
    hash-partitioned left-outer Dataset.join marks membership."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cut_us = np.int64(cutoff.astype("datetime64[us]").astype(np.int64))

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = np.rint(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        pos = bal > 0
        return pa.table({"_k": pa.array([0], type=pa.int64()),
                         "tot": pa.array([np.int64(bal[pos].sum())]),
                         "n": pa.array([np.int64(pos.sum())])})

    stats = customer.map_batches(bal_partial, batch_format="pyarrow") \
        .groupby("_k").aggregate(Sum("tot", alias_name="tot"),
                                 Sum("n", alias_name="n")).take_all()
    tot_c = np.int64(stats[0]["tot"]) if stats else np.int64(0)
    n_pos = np.int64(stats[0]["n"]) if stats else np.int64(0)

    def active_partial(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": pa.array(
            np.unique(ck[ts >= cut_us]).astype(np.int64))})

    active = orders.map_batches(active_partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Count(alias_name="_n")) \
        .materialize()
    n_active = active.count()

    def rich_mask(batch: pa.Table):
        bal = np.rint(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        return bal, bal * n_pos > tot_c

    def nation_partial(nk: np.ndarray, bal: np.ndarray) -> pa.Table:
        un, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "c_nationkey": pa.array(un.astype(np.int64)),
            "n_cust": pa.array(np.bincount(inv).astype(np.int64)),
            "total_acctbal_c": pa.array(
                np.bincount(inv, weights=bal).astype(np.int64))})

    if n_active <= broadcast_cap:
        act = np.sort(np.asarray(
            [r["o_custkey"] for r in active.take_all()], dtype=np.int64))
        act_ref = ray.put(act)

        def fold(batch: pa.Table) -> pa.Table:
            akeys = ray.get(act_ref)
            ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
            bal, rich = rich_mask(batch)
            pos = np.searchsorted(akeys, ck)
            pos_c = np.minimum(pos, max(len(akeys) - 1, 0))
            is_active = (pos < len(akeys)) & (akeys[pos_c] == ck) \
                if len(akeys) else np.zeros(len(ck), dtype=bool)
            keep = rich & ~is_active
            nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)[keep]
            return nation_partial(nk, bal[keep])

        parts = customer.map_batches(fold, batch_format="pyarrow")
    else:
        def cust_proj(batch: pa.Table) -> pa.Table:
            bal, rich = rich_mask(batch)
            return pa.table({
                "c_custkey": pa.array(
                    batch["c_custkey"].to_numpy(zero_copy_only=False)[rich]),
                "c_nationkey": pa.array(
                    batch["c_nationkey"].to_numpy(
                        zero_copy_only=False)[rich]),
                "bal_c": pa.array(bal[rich])})

        rich_ds = customer.map_batches(cust_proj,
                                       batch_format="pyarrow") \
            .materialize()
        joined = rich_ds.join(active, join_type="left_outer",
                              num_partitions=num_partitions,
                              on=("c_custkey",), right_on=("o_custkey",))

        def anti(batch: pa.Table) -> pa.Table:
            miss = np.asarray(
                [v is None for v in batch["_n"].to_pylist()], dtype=bool)
            nk = batch["c_nationkey"].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)[miss]
            bal = batch["bal_c"].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)[miss]
            return nation_partial(nk, bal)

        parts = joined.map_batches(anti, batch_format="pyarrow")

    agg = parts.groupby("c_nationkey") \
        .aggregate(Sum("n_cust", alias_name="n_cust"),
                   Sum("total_acctbal_c", alias_name="total_acctbal_c"))
    return agg.map_batches(
        lambda b: pa.table({
            "c_nationkey": b["c_nationkey"].cast(pa.int64()),
            "n_cust": b["n_cust"].cast(pa.int64()),
            "total_acctbal_c": b["total_acctbal_c"].cast(pa.int64())}),
        batch_format="pyarrow")


def top_supplier(lineitem, supplier: pa.Table, date_lo: np.datetime64,
                 date_hi: np.datetime64):
    """TPC-H Q15 semantics: the supplier(s) achieving the maximum
    revenue over lines shipped in [date_lo, date_hi) — the
    revenue-view + global-max-broadcast shape (all max-achievers
    returned, ties included, revenue in exact integer 1e-4 units).

    Scale shape: per-batch per-suppkey bincount partials feed ONE
    native groupby Sum bounded by |suppliers|; the global max is a
    constant-size aggregate fold whose scalar broadcasts back into a
    map-side filter (no second shuffle). Names attach from the
    driver-resident supplier dim."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo_us = np.int64(date_lo.astype("datetime64[us]").astype(np.int64))
    hi_us = np.int64(date_hi.astype("datetime64[us]").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ts >= lo_us) & (ts < hi_us)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        price = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * (100 - np.rint(disc * 100.0).astype(np.int64)))
        un, inv = np.unique(sk, return_inverse=True)
        return pa.table({
            "l_suppkey": pa.array(un.astype(np.int64)),
            "rev_c4": pa.array(np.bincount(inv, weights=rev)
                               .astype(np.int64))})

    empty = pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                      "s_name": pa.array([], type=pa.string()),
                      "total_revenue_c4": pa.array([], type=pa.int64())})

    agg = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey") \
        .aggregate(Sum("rev_c4", alias_name="total_revenue_c4")) \
        .materialize()
    if agg.count() == 0:
        return rd.from_arrow(empty)
    best = np.int64(agg.max("total_revenue_c4"))

    sname = dict(zip(supplier["s_suppkey"].to_pylist(),
                     supplier["s_name"].to_pylist()))
    names_ref = ray.put(sname)

    def finish(batch: pa.Table) -> pa.Table:
        sn = ray.get(names_ref)
        rev = batch["total_revenue_c4"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = rev == best
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "s_suppkey": pa.array(sk.astype(np.int64)),
            "s_name": pa.array([sn[int(s)] for s in sk],
                               type=pa.string()),
            "total_revenue_c4": pa.array(rev[keep])})

    return agg.map_batches(finish, batch_format="pyarrow")


def nation_trade_volume(lineitem, orders, customer: pa.Table,
                        supplier: pa.Table, nation: pa.Table,
                        date_lo: np.datetime64, date_hi: np.datetime64,
                        num_partitions: int = 8,
                        broadcast_cap: int = 2_000_000):
    """TPC-H Q7 shape: revenue shipped in [date_lo, date_hi) grouped by
    (supplier nation, customer nation) for cross-nation pairs — the
    two-fact join with BOTH dimension attaches (revenue in exact integer
    1e-4 units).

    Scale shape: suppkey→nationkey and custkey→nationkey broadcast ONCE
    as dense int arrays (region_revenue's dim discipline); under
    `broadcast_cap` the orders fact broadcasts as sorted (orderkey,
    custkey) arrays and the lineitem fact folds per batch to packed
    (snat, cnat) pair partials — zero joins, final groupby ≤|nation|²;
    past the cap the two facts meet in ONE hash-partitioned
    Dataset.join on the orderkey. Names attach from the driver-resident
    nation dim at the end."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo_us = np.int64(date_lo.astype("datetime64[us]").astype(np.int64))
    hi_us = np.int64(date_hi.astype("datetime64[us]").astype(np.int64))

    snat = _dense_map(supplier["s_suppkey"].to_numpy(),
                      supplier["s_nationkey"].to_numpy().astype(np.int64),
                      fill=-1)
    cnat = _dense_map(customer["c_custkey"].to_numpy(),
                      customer["c_nationkey"].to_numpy().astype(np.int64),
                      fill=-1)
    dims_ref = ray.put((snat, cnat))
    nname = np.full(int(nation["n_nationkey"].to_numpy().max()) + 1, "",
                    dtype=object)
    nname[nation["n_nationkey"].to_numpy()] = \
        np.asarray(nation["n_name"].to_pylist(), dtype=object)

    empty = pa.table({"supp_nation": pa.array([], type=pa.string()),
                      "cust_nation": pa.array([], type=pa.string()),
                      "revenue_c4": pa.array([], type=pa.int64())})

    def line_proj(batch: pa.Table):
        ts = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ts >= lo_us) & (ts < hi_us)
        price = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = (np.rint(price * 100.0).astype(np.int64)
               * (100 - np.rint(disc * 100.0).astype(np.int64)))
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        return lk, sk, rev

    def pair_partial(sn: np.ndarray, cn: np.ndarray,
                     rev: np.ndarray) -> pa.Table:
        keep = sn != cn
        code = sn[keep].astype(np.int64) * 4096 + cn[keep]
        un, inv = np.unique(code, return_inverse=True)
        return pa.table({
            "pair": pa.array(un),
            "rev_c4": pa.array(np.bincount(inv, weights=rev[keep])
                               .astype(np.int64))})

    def finish(agg):
        def fin(batch: pa.Table) -> pa.Table:
            pair = batch["pair"].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "supp_nation": pa.array(nname[pair // 4096].tolist(),
                                        type=pa.string()),
                "cust_nation": pa.array(nname[pair % 4096].tolist(),
                                        type=pa.string()),
                "revenue_c4": batch["revenue_c4"].cast(pa.int64())})

        return agg.map_batches(fin, batch_format="pyarrow")

    o_proj = orders.map_batches(
        lambda b: pa.table({
            "o_orderkey": b["o_orderkey"].cast(pa.int64()),
            "o_custkey": b["o_custkey"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    n_orders = o_proj.count()
    if n_orders == 0:
        return rd.from_arrow(empty)

    if n_orders <= broadcast_cap:
        rows = o_proj.take_all()
        ok_arr = np.asarray([r["o_orderkey"] for r in rows],
                            dtype=np.int64)
        ck_arr = np.asarray([r["o_custkey"] for r in rows],
                            dtype=np.int64)
        order = np.argsort(ok_arr, kind="stable")
        omap_ref = ray.put((ok_arr[order], ck_arr[order]))

        def fold(batch: pa.Table) -> pa.Table:
            okeys, custs = ray.get(omap_ref)
            sn_map, cn_map = ray.get(dims_ref)
            lk, sk, rev = line_proj(batch)
            pos = np.searchsorted(okeys, lk)
            pos_c = np.minimum(pos, max(len(okeys) - 1, 0))
            hit = (pos < len(okeys)) & (okeys[pos_c] == lk)
            sn = _lookup(sn_map, sk[hit])
            cn = _lookup(cn_map, custs[pos_c[hit]])
            return pair_partial(sn, cn, rev[hit])

        parts = lineitem.map_batches(fold, batch_format="pyarrow")
    else:
        def lproj(batch: pa.Table) -> pa.Table:
            lk, sk, rev = line_proj(batch)
            return pa.table({"l_orderkey": pa.array(lk),
                             "l_suppkey": pa.array(sk),
                             "rev_c4": pa.array(rev)})

        l_proj = lineitem.map_batches(lproj,
                                      batch_format="pyarrow") \
            .materialize()
        if l_proj.count() == 0:
            return rd.from_arrow(empty)
        joined = l_proj.join(o_proj, join_type="inner",
                             num_partitions=num_partitions,
                             on=("l_orderkey",),
                             right_on=("o_orderkey",))

        def post(batch: pa.Table) -> pa.Table:
            sn_map, cn_map = ray.get(dims_ref)
            sn = _lookup(sn_map, batch["l_suppkey"].cast(pa.int64())
                         .to_numpy(zero_copy_only=False))
            cn = _lookup(cn_map, batch["o_custkey"].cast(pa.int64())
                         .to_numpy(zero_copy_only=False))
            rev = batch["rev_c4"].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            return pair_partial(sn, cn, rev)

        parts = joined.map_batches(post, batch_format="pyarrow")

    agg = parts.groupby("pair") \
        .aggregate(Sum("rev_c4", alias_name="revenue_c4"))
    return finish(agg)


def benford_digits(ds, value_col: str = "value"):
    """First-significant-digit distribution of a positive integer-cents
    value column — the Benford's-law audit signal for synthetic or
    manipulated numeric data (Benford 1938; Nigrini's forensic
    accounting use). Exact integer counts: digit extraction is
    repeated integer division (≤19 vectorized passes), no float log10
    edge cases at powers of ten.

    Scale shape: per-batch 9-bin bincount partials, ONE constant-size
    groupby Sum. Returns (digit, n) for digits 1-9."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vc = np.rint(batch[value_col].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        vc = vc[vc > 0]
        x = vc.copy()
        big = x >= 10
        while big.any():
            x[big] //= 10
            big = x >= 10
        cnt = np.bincount(x, minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10,
                                                     dtype=np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n", alias_name="n"))

    def fin(batch: pa.Table) -> pa.Table:
        n = batch["n"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = n > 0
        return pa.table({
            "digit": pa.array(batch["digit"].cast(pa.int64())
                              .to_numpy(zero_copy_only=False)[keep]),
            "n": pa.array(n[keep])})

    return agg.map_batches(fin, batch_format="pyarrow")
