"""Dataset block hygiene shared across pipelines.

Ray 2.49's groupby / map_groups chain emits zero-ROW zero-COLUMN blocks
for group-less inputs, map_batches short-circuits empty blocks (so a
normalizing UDF never sees them), and Dataset.join's per-partition
ArrowBlockBuilder then builds a schema-less table that crashes Acero.
Every pipeline that feeds a groupby chain into a join needs these.
"""

from __future__ import annotations

import ray as _ray

_remote_num_rows = _ray.remote(num_cpus=0)(lambda t: t.num_rows)


def bounded_rows(ds, cap: int, what: str):
    """take_all for DRIVER-SIDE PARTIAL FOLDS with a hard row bound:
    every driver fold in this repo is supposed to be constant-bounded
    (per-block stats tuples, grid rasters, <=cap sketches). If a fold
    unexpectedly explodes, this raises an informative error instead of
    OOMing the driver. Returns the row list, like take_all()."""
    try:
        return ds.take_all(limit=cap)
    except ValueError as e:
        raise ValueError(
            f"driver fold '{what}' exceeded its {cap}-row bound — the "
            "partial unexpectedly exploded; route it through its "
            "bucketed / dataset-resident twin instead of the driver"
        ) from e


def pool_size(concurrency=None, frac: int = 8, floor: int = 2) -> int:
    """Cluster-derived actor-pool size: CPUs // frac, floored for tiny
    sessions. Fixed-size pools RESERVE their CPUs for the whole stage
    (CLAUDE.md pool-reservation landmine), so pools are sized as a
    FRACTION of the cluster, never a constant — a hardcoded 2-actor
    pool would cap a 100-node cluster's whole pipeline (VERDICT r04
    item #4). Pass an explicit `concurrency` to pin."""
    if concurrency is not None:
        return concurrency
    return max(floor, int(_ray.cluster_resources().get("CPU", 8)) // frac)


def hash_distinct(ds, cols, coarse: int | None = None):
    """Exact distinct over (possibly string) key columns via a COARSE
    int32 hash-bucket shuffle + per-bucket Arrow C++ distinct — Ray's
    native Aggregate shuffle sorts the raw key columns, which for
    image-scale STRING keys costs ~10x more than shuffling an int32
    bucket id (measured: 20M two-string-column rows, 177s native vs
    hash-bucketed seconds). Same coarse-bucket shape as
    stages/dedup._bucket_pairs: O(buckets) groups so map_groups pays
    Python overhead per partition, not per key; collisions are harmless
    (the in-bucket distinct compares the REAL column values)."""
    import numpy as np
    import pyarrow as pa

    from .functions.hashing import hash_str_u64, splitmix64

    if coarse is None:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        coarse = 4 * max(2, cpus)

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in cols:
                col = b[c]
                if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                    h = splitmix64(h ^ hash_str_u64(col))
                else:
                    v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
                    h = splitmix64(h ^ v.view(np.uint64))
        return b.append_column(
            "_cb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    def dedup(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return g
        return g.select(cols).group_by(cols).aggregate([])

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_cb").map_groups(dedup, batch_format="pyarrow")


def _drop_empty_blocks(ds):
    """Rebuild a Dataset without its zero-row blocks. Only block refs and
    row counts touch the driver — the data stays in the object store.
    Returns None when every block is empty."""
    import ray

    refs = ds.to_arrow_refs()
    if not refs:
        return None
    nrows = ray.get([_remote_num_rows.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, nrows) if n]
    if not keep:
        return None
    import ray.data as rd
    return rd.from_arrow_refs(keep)


def strip_schema_metadata(t):
    """Drop table-level schema metadata before a block leaves a UDF.

    The testdata parquet schemas carry a b'pandas' metadata blob whose
    value makes `hash(pa.Schema)` raise (unhashable dict), so every
    downstream schema-unify logs "Failed to hash the schemas" — harmless
    but it buries real warnings in driver logs. Zero-copy (schema swap
    only). Apply in per-group UDFs that echo slices of their input."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def group_by_key_bucket(ds, key_cols, fold, buckets: int | None = None,
                        batch_format: str = "pyarrow"):
    """The segmented-fold replacement for per-key `groupby(key)
    .map_groups`: ONE hash(keys)%buckets int32 shuffle, then `fold` runs
    once per BUCKET over a multi-key table (the `_b` column is stripped
    before the fold sees it). Per-key `map_groups` pays ~5 ms of Python/
    pandas overhead per DISTINCT key (memory: spatial_knn 131 s -> 34 s
    from this exact conversion); bucketing pays it per partition —
    O(CPUs), not O(keys). `fold` must therefore be multi-key vectorized:
    every key's rows arrive in the same bucket, several keys per call,
    unsorted (fold does its own lexsort).

    Hash collisions are harmless — fold compares real key values. Works
    for pyarrow folds (fold(pa.Table) -> pa.Table) and pandas folds
    (batch_format="pandas")."""
    import numpy as np
    import pyarrow as pa

    from .functions.hashing import hash_str_u64, splitmix64

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if buckets is None:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        buckets = 4 * max(2, cpus)

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in key_cols:
                col = b[c]
                if pa.types.is_string(col.type) or \
                        pa.types.is_large_string(col.type):
                    h = splitmix64(h ^ hash_str_u64(col))
                else:
                    v = col.cast(pa.int64()).to_numpy(
                        zero_copy_only=False)
                    h = splitmix64(h ^ v.view(np.uint64))
        return b.append_column(
            "_b", pa.array((h % np.uint64(buckets)).astype(np.int32)))

    if batch_format == "pandas":
        def wrap(g):
            if "_b" in g.columns:
                g = g.drop(columns=["_b"])
            return fold(g)
    else:
        def wrap(g: pa.Table):
            if "_b" in g.schema.names:
                g = g.drop_columns(["_b"])
            return fold(g)

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(wrap, batch_format=batch_format)


def attach_lookup_bucketed(ds, lookup, key_col: str, val_col: str,
                           out_col: str, lookup_key: str | None = None,
                           buckets: int | None = None):
    """Equality-attach a (key, value) lookup Dataset's `val_col` onto
    every `ds` row as `out_col` through ONE hash(key)%buckets union
    shuffle — the scale twin of the ray.put broadcast-lookup pattern for
    lookup tables beyond worker RAM (the semi_join_bucketed union shape
    with a carried value). Neither side ever materializes on the driver.
    Rows whose key is absent from the lookup get a null `out_col`;
    duplicate lookup keys resolve to the first in sorted order. `ds`
    payload columns pass through untouched."""
    import numpy as np
    import pyarrow as pa

    from .functions.hashing import hash_str_u64

    lookup_key = lookup_key or key_col
    if buckets is None:
        buckets = 4 * max(2, int(_ray.cluster_resources().get("CPU", 8)))

    pschema = ds.schema()
    pcols = list(zip(pschema.names, pschema.types))
    lschema = lookup.schema()
    val_type = dict(zip(lschema.names, lschema.types))[val_col]
    key_type = dict(zip(pschema.names, pschema.types))[key_col]
    int_key = pa.types.is_integer(key_type)

    def keyarr(col):
        if int_key:
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return np.asarray(col.to_pylist(), dtype=object).astype(str)

    def bucket_of(col):
        if int_key:
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            return (v.view(np.uint64) % np.uint64(buckets)) \
                .astype(np.int32)
        return (hash_str_u64(col.cast(pa.string()))
                % np.uint64(buckets)).astype(np.int32)

    def tag_ds(batch: pa.Table) -> pa.Table:
        out = {"_v": pa.nulls(batch.num_rows, type=val_type),
               "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
               "_b": pa.array(bucket_of(batch[key_col]))}
        for c, _ in pcols:
            out[c] = batch[c]
        return pa.table(out)

    def tag_lookup(batch: pa.Table) -> pa.Table:
        out = {"_v": batch[val_col].cast(val_type),
               "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
               "_b": pa.array(bucket_of(batch[lookup_key]))}
        for c, t in pcols:
            out[c] = batch[lookup_key].cast(key_type) if c == key_col \
                else pa.nulls(batch.num_rows, type=t)
        return pa.table(out)

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {c: pa.array([], type=t) for c, t in pcols}
            | {out_col: pa.array([], type=val_type)})
        if g.num_rows == 0 or "_side" not in g.schema.names:
            return empty
        side = g["_side"].to_numpy(zero_copy_only=False)
        is_l = side == 1
        rows = np.flatnonzero(~is_l)
        if not len(rows):
            return empty
        k = keyarr(g[key_col])
        lk = k[is_l]
        # the ds-side "_v" nulls float the whole numpy column; the
        # lookup-side values are all non-null, so cast back to the
        # declared type after selection
        lv = g["_v"].to_numpy(zero_copy_only=False)[is_l]
        if pa.types.is_integer(val_type):
            lv = lv.astype(np.int64)
        o = np.argsort(lk, kind="stable")
        lk, lv = lk[o], lv[o]
        pk = k[rows]
        kept = g.take(pa.array(rows, type=pa.int64()))
        out = {c: kept[c] for c, _ in pcols}
        if len(lk):
            pos = np.searchsorted(lk, pk)
            cl = np.minimum(pos, len(lk) - 1)
            hit = (pos < len(lk)) & (lk[cl] == pk)
            out[out_col] = pa.array(lv[cl], type=val_type,
                                    mask=~hit)
        else:
            out[out_col] = pa.nulls(len(rows), type=val_type)
        return pa.table(out)

    tagged = ds.map_batches(tag_ds, batch_format="pyarrow") \
        .union(lookup.map_batches(tag_lookup, batch_format="pyarrow"))
    return tagged.groupby("_b").map_groups(fold, batch_format="pyarrow")


def sum_by_key_bucket(ds, key_col: str, val_cols: list[str],
                      buckets: int | None = None):
    """Integer Sum-groupby over a HIGH-CARDINALITY int64 key through ONE
    hash(key)%buckets shuffle + a reduceat fold per bucket — the native
    sort-based Aggregate pays per-group overhead that dominates when
    nearly every row is its own group (measured: 583k distinct keys /
    600k rows took 9.2 s natively, ~1 s bucketed). Exact for int64
    sums; each key lands wholly in one bucket so bucket-local sums are
    globally exact. Returns (key_col, *val_cols) int64."""
    import numpy as np
    import pyarrow as pa

    def fold(g: pa.Table) -> pa.Table:
        schema = pa.schema([(key_col, pa.int64())]
                           + [(c, pa.int64()) for c in val_cols])
        if g.num_rows == 0 or key_col not in g.schema.names:
            return schema.empty_table()
        k = g[key_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        cols = {key_col: pa.array(ks[starts])}
        for c in val_cols:
            v = g[c].cast(pa.int64()).to_numpy(
                zero_copy_only=False)[order]
            cols[c] = pa.array(np.add.reduceat(v, starts)
                               .astype(np.int64))
        return pa.table(cols)

    return group_by_key_bucket(ds, key_col, fold, buckets=buckets)
