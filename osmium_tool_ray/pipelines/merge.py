"""Merge / sort / dedup / version-window operators.

Reference semantics re-expressed as Ray Data shuffles (SURVEY.md §2.4-2.6):

  * merge: k-way merge of sorted inputs, equal (type,id,version) objects
    emitted once (/root/reference/src/command_merge.cpp:256-275 queue loop,
    :260 dedup). Ray: union + groupby(key).first — a sort-based shuffle
    replaces the priority queue.
  * merge-changes --simplify: keep only the last version of each object
    (/root/reference/src/command_merge_changes.cpp:123-144
    reverse+stable_sort+unique_copy). Ray: groupby(id) -> max version.
  * apply-changes: change file wins over base at equal (id, version);
    last version wins overall (object_order_type_id_reverse_version,
    /root/reference/src/command_apply_changes.cpp:327-334); history mode
    keeps every distinct version (:317-325).
  * time-filter: snapshot at time T of a history stream — per id keep the
    version with the largest timestamp <= T, drop it if not visible
    (/root/reference/src/command_time_filter.cpp:131-189 DiffIterator
    windows).
  * derive-changes / diff: ordered full-outer comparison of two snapshots
    into created/modified/deleted (or left/right/same/different) classes
    (/root/reference/src/command_derive_changes.cpp:153-203,
    command_diff.cpp:293-396).

All group steps pre-project to narrow key/version columns where possible;
payload columns ride along only when the caller asks for full rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def merge(datasets: list, key_cols: list[str]):
    """Union N datasets, emit each distinct key once. The merge contract
    (command_merge.cpp:256-275) guarantees equal-key copies are identical,
    so a native Min aggregate per non-key column reconstructs the row —
    fully vectorized, no per-group Python."""
    from ray.data.aggregate import Min

    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    other_cols = [c for c in ds.schema().names if c not in key_cols]
    return ds.groupby(key_cols).aggregate(
        *[Min(c, alias_name=c) for c in other_cols])


def argmax_rows(ds, key_cols: list[str], order_cols: list[str]):
    """Per key, the single row maximizing the order_cols tuple.

    Map-side combiner first: each batch reduces to one candidate row per
    key (vectorized pandas sort + drop_duplicates), so the shuffle and
    the finisher see at most one row per key per input batch instead of
    the full table. The finisher groups by hash(keys)%buckets and runs
    the SAME multi-key pick once per bucket — Python overhead per
    partition, not per distinct key (group_by_key_bucket)."""
    from ..blocks import group_by_key_bucket

    asc = [True] * len(key_cols) + [False] * len(order_cols)
    cols = key_cols + order_cols

    def local(df: pd.DataFrame) -> pa.Table:
        out = df if df.empty else \
            df.sort_values(cols, ascending=asc, kind="stable") \
              .drop_duplicates(subset=key_cols, keep="first")
        # emit metadata-free Arrow: the pandas round-trip would attach a
        # schema-metadata dict that defeats the shuffle's schema-dedup
        # hash (the "Failed to hash the schemas" warning)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    reduced = ds.map_batches(local, batch_format="pandas")
    return group_by_key_bucket(reduced, key_cols, local,
                               batch_format="pandas")


def topk_per_key(ds, key_cols: list[str], order_cols: list[str], k: int):
    """Per key, the k rows maximizing the order_cols tuple (the
    row_number() OVER (PARTITION BY key ORDER BY ... DESC) <= k window,
    generalizing argmax_rows' k=1).

    Same partial+final shape: each batch first prunes to at most k
    candidate rows per key (one vectorized sort + grouped head), so the
    shuffle carries <= k rows per key per input block; the finisher
    repeats the multi-key prune once per hash(keys)%buckets bucket
    (group_by_key_bucket — per-partition Python, not per-key). Ties
    resolve by the full sort-key tuple, so add a unique tiebreaker
    column to order_cols for byte-stable output."""
    from ..blocks import group_by_key_bucket

    asc = [True] * len(key_cols) + [False] * len(order_cols)
    cols = key_cols + order_cols

    def local(df: pd.DataFrame) -> pa.Table:
        out = df if df.empty else \
            df.sort_values(cols, ascending=asc, kind="stable") \
              .groupby(key_cols, sort=False).head(k)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)   # see argmax_rows

    reduced = ds.map_batches(local, batch_format="pandas")
    return group_by_key_bucket(reduced, key_cols, local,
                               batch_format="pandas")


def _pack_order(batch: pa.Table, order_cols: list[str]) -> pa.Array:
    """Fixed-width big-endian packing of an integer/timestamp order tuple:
    lexicographic byte order == tuple order, so a native Max aggregate
    computes argmax without per-group Python. int64 values are offset to
    unsigned; timestamps use their epoch representation."""
    import pyarrow.compute as pc

    parts = []
    for c in order_cols:
        col = batch[c]
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        v = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        u = (v.view(np.uint64) + np.uint64(1 << 63)).byteswap()  # BE unsigned
        parts.append(u.view(np.uint8).reshape(-1, 8))
    flat = np.concatenate(parts, axis=1)
    n, w = flat.shape
    offsets = np.arange(0, (n + 1) * w, w, dtype=np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()),
                         pa.py_buffer(flat.tobytes())])


def argmax_rows_native(ds, key_cols: list[str], order_cols: list[str],
                       num_partitions: int | None = None):
    """Zero-per-group-Python argmax for integer/timestamp order columns
    whose tuple is UNIQUE per key (pass a unique tiebreaker last): pack
    the order tuple into one fixed-width sortable binary, reduce with the
    NATIVE Max aggregate, then join the winners back and keep rows whose
    packed key equals their group's max. Two native shuffles; the
    map-side combiner from argmax_rows still applies first so the join
    sees at most one row per key per input block."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    if num_partitions is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)

    asc = [True] * len(key_cols) + [False] * len(order_cols)
    cols = key_cols + order_cols

    def local(df: pd.DataFrame) -> pa.Table:
        out = df if df.empty else \
            df.sort_values(cols, ascending=asc, kind="stable") \
              .drop_duplicates(subset=key_cols, keep="first")
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)   # see argmax_rows

    def add_ord(batch: pa.Table) -> pa.Table:
        return batch.append_column("_ord", _pack_order(batch, order_cols))

    reduced = ds.map_batches(local, batch_format="pandas") \
        .map_batches(add_ord, batch_format="pyarrow").materialize()
    maxes = reduced.groupby(key_cols).aggregate(Max("_ord", alias_name="_max"))
    from ..blocks import _drop_empty_blocks
    maxes = _drop_empty_blocks(maxes)
    if maxes is None:
        return reduced.drop_columns(["_ord"]).limit(0)
    joined = maxes.join(reduced, join_type="inner",
                        num_partitions=num_partitions, on=tuple(key_cols))

    def keep_max(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["_ord"], batch["_max"])) \
            .drop_columns(["_ord", "_max"])

    return joined.map_batches(keep_max, batch_format="pyarrow")


def _sortable(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Numpy array preserving the column's NATIVE sort order (numeric /
    timestamp values stay numeric — stringifying would rank 10 < 2)."""
    t = col.type
    if pa.types.is_timestamp(t):
        col = col.cast(pa.int64())
        t = col.type
    if pa.types.is_integer(t) or pa.types.is_floating(t) \
            or pa.types.is_boolean(t):
        return col.to_numpy(zero_copy_only=False)
    return np.asarray(col.to_pylist(), dtype=object).astype(str)


def dedup_exact(ds, key_cols: list[str],
                order_col: str | list[str] | None = None):
    """Exact dedup: one row per key (lowest order_col tuple wins when
    given — a str or list of columns).

    In-batch keep-first pre-prune (at most one row per key leaves each
    input block, bounding shuffle volume by distinct keys x blocks) then
    ONE hash(keys)%buckets shuffle and the same vectorized lexsort
    keep-first per bucket — Python overhead per partition, never per
    distinct key (the group_by_key_bucket discipline; the old
    groupby(key).map_groups paid ~5 ms pandas per key)."""
    from ..blocks import group_by_key_bucket

    key_cols = list(key_cols)
    if order_col is None:
        order_cols = []
    elif isinstance(order_col, str):
        order_cols = [order_col]
    else:
        order_cols = list(order_col)
    sort_cols = key_cols + order_cols

    def keep_first(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        arrs = tuple(_sortable(g[c]) for c in sort_cols)
        order = np.lexsort(arrs[::-1])
        new = np.zeros(len(order), dtype=bool)
        new[0] = True
        for a in (a[order] for a in arrs[:len(key_cols)]):
            new[1:] |= a[1:] != a[:-1]
        return g.take(pa.array(order[new], type=pa.int64()))

    pruned = ds.map_batches(keep_first, batch_format="pyarrow")
    return group_by_key_bucket(pruned, key_cols, keep_first)


def sort_dataset(ds, keys: list[str], descending=False):
    """Global sort — the sink-time ordering contract (command_sort.cpp:150);
    Ray's range-partitioned distributed sort replaces both the reference's
    'simple' (all-in-RAM) and 'multipass' strategies."""
    return ds.sort(keys, descending=descending)


def apply_changes(base, changes, id_cols: list[str], version_col: str = "version",
                  history: bool = False):
    """Merge a change stream onto a base snapshot.

    Non-history: per id keep the row with the highest (version, source) —
    source=1 for changes, so the change wins ties at equal version.
    History: keep every distinct (id, version), change copy winning within a
    version."""
    import pyarrow.compute as pc

    def tag(src):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column("_src", pa.array(np.full(b.num_rows, src, dtype=np.int8)))
        return f

    u = base.map_batches(tag(0), batch_format="pyarrow").union(
        changes.map_batches(tag(1), batch_format="pyarrow"))
    keys = id_cols + [version_col] if history else id_cols
    win = argmax_rows(u, keys, [version_col, "_src"] if not history else ["_src"])
    return win.drop_columns(["_src"])


def merge_changes_simplify(datasets: list, id_cols: list[str], version_col: str = "version",
                           unique_versions: bool = False):
    """merge-changes --simplify: union change files, keep last version only.

    unique_versions=True opts into the zero-per-group-Python packed-Max
    path, valid ONLY when each (id, version) appears in at most one
    input (ties would be emitted twice by the max-equality filter). The
    default handles the reference's normal case — overlapping change
    files that can repeat the same version of an object — via the
    stable dedup of argmax_rows."""
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    if unique_versions:
        return argmax_rows_native(ds, id_cols, [version_col])
    return argmax_rows(ds, id_cols, [version_col])


def time_filter(ds, t, id_cols: list[str], ts_col: str = "ts",
                visible_col: str | None = "visible",
                tiebreak_cols: list[str] | None = None):
    """Snapshot visible at time `t`: per id the latest version with ts <= t,
    dropped when that version is not visible (deleted). Vectorized filter +
    combiner argmax; pass tiebreak_cols for determinism at equal ts."""
    import pyarrow.compute as pc

    def cut(b: pa.Table) -> pa.Table:
        return b.filter(pc.less_equal(b[ts_col], pa.scalar(t)))

    win = argmax_rows(ds.map_batches(cut, batch_format="pyarrow"),
                      id_cols, [ts_col] + list(tiebreak_cols or []))
    if visible_col is None:
        return win

    def vis(b: pa.Table) -> pa.Table:
        if visible_col not in b.schema.names:
            return b
        return b.filter(b[visible_col])

    return win.map_batches(vis, batch_format="pyarrow")


def time_filter_range(ds, t_from, t_to, id_cols: list[str],
                      ts_col: str = "ts", order_cols: list[str] | None = None):
    """osmium time-filter FROM TO (range mode): keep every version whose
    validity interval [own ts, next version's ts) intersects [from, to) —
    libosmium DiffObject::is_between semantics as pinned by the reference
    golden suite (/root/reference/test/time-filter/output-range-*.osh and
    command_time_filter.cpp:169-178):

        start < to AND (no successor OR end > from
                        OR (start == end AND start >= from))

    Visibility is NOT consulted in range mode (deleted versions appear in
    output-range-0-5.osh); point-in-time snapshots are `time_filter`.

    Distributed as a lead() window: range-partitioned sort on
    (id, order), then each block computes successor timestamps
    vectorized; the one cross-block successor comes from a
    driver-mediated boundary exchange of each block's FIRST row (narrow,
    #blocks rows — no extra shuffle beyond the sort)."""
    import ray
    import ray.data as rd

    order_cols = list(order_cols or [ts_col])
    sorted_ds = ds.sort(list(id_cols) + order_cols)
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        return sorted_ds

    @ray.remote(num_cpus=0)
    def first_row(t: pa.Table):
        if t.num_rows == 0:
            return None
        return ({c: t[c][0].as_py() for c in id_cols}, t[ts_col][0].as_py())

    firsts = ray.get([first_row.remote(r) for r in refs])
    # block i's boundary successor = first row of the next non-empty block
    nxt = [None] * len(refs)
    carry = None
    for i in range(len(refs) - 1, -1, -1):
        nxt[i] = carry
        if firsts[i] is not None:
            carry = firsts[i]

    @ray.remote(num_cpus=0)
    def filt(t: pa.Table, nxt_first):
        if t.num_rows == 0:
            return t
        n = t.num_rows
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        same = np.ones(n - 1, dtype=bool)
        for c in id_cols:
            v = t[c].to_numpy(zero_copy_only=False)
            same &= v[1:] == v[:-1]
        succ = ts.copy()
        succ_exists = np.zeros(n, dtype=bool)
        succ_exists[:-1] = same
        succ[:-1][same] = ts[1:][same]
        if nxt_first is not None:
            nid, nts = nxt_first
            if all(t[c][-1].as_py() == nid[c] for c in id_cols):
                succ[-1] = nts
                succ_exists[-1] = True
        keep = (ts < t_to) & (
            ~succ_exists | (succ > t_from)
            | ((succ == ts) & (ts >= t_from)))
        return t.filter(pa.array(keep))

    return rd.from_arrow_refs([filt.remote(r, nxt[i])
                               for i, r in enumerate(refs)])


def derive_changes(old, new, id_cols: list[str], value_cols: list[str]):
    """Full-outer comparison -> (id_cols..., change) rows with
    change='created'|'modified'|'deleted'|'same' (diff keeps 'same';
    derive-changes drops it).

    Vectorized: each side contributes (id, side, row-content-hash); a single
    native groupby aggregate (count / side-sum / hash-min / hash-max) then a
    vectorized classify — no per-group Python (the reference's two-cursor
    walk, command_derive_changes.cpp:153-203, becomes one shuffle of narrow
    rows)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..functions.hashing import hash_str_u64

    def tag(src):
        def f(b: pa.Table) -> pa.Table:
            cols = [b[c].cast(pa.string()).combine_chunks() for c in value_cols]
            joined = pc.binary_join_element_wise(*cols, "\x1f") if len(cols) > 1 \
                else cols[0]
            h = hash_str_u64(joined)
            out = {c: b[c] for c in id_cols}
            out["_side"] = pa.array(np.full(b.num_rows, src, dtype=np.int64))
            out["_h"] = pa.array(h.view(np.int64))
            return pa.table(out)
        return f

    u = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))
    agg = u.groupby(id_cols).aggregate(
        Count(alias_name="_n"), Sum("_side", alias_name="_s"),
        Min("_h", alias_name="_hmin"), Max("_h", alias_name="_hmax"))

    def classify(b: pa.Table) -> pa.Table:
        n = b["_n"].to_numpy(zero_copy_only=False)
        s = b["_s"].to_numpy(zero_copy_only=False)
        hmin = b["_hmin"].to_numpy(zero_copy_only=False)
        hmax = b["_hmax"].to_numpy(zero_copy_only=False)
        change = np.where(n == 1, np.where(s == 0, "deleted", "created"),
                          np.where(hmin == hmax, "same", "modified"))
        out = {c: b[c] for c in id_cols}
        out["change"] = pa.array(change, type=pa.string())
        return pa.table(out)

    return agg.map_batches(classify, batch_format="pyarrow")


def derive_change_records(old, new, id_cols: list[str],
                          value_cols: list[str],
                          keep_details: bool = False,
                          increment_version: bool = False,
                          version_col: str | None = None):
    """Full derive-changes output records, not just the classification
    (command_derive_changes.cpp:153-203 + the option handling):

      * created/modified rows carry the NEW side's payload;
      * deleted rows carry only id/version by default (the reference
        writes deletes "in the reduced form", payload columns nulled) —
        --keep-details (:62-66) keeps the OLD side's full payload;
      * --increment-version (:67-70) bumps the deleted row's version.

    Shape: the classification (one narrow shuffle, derive_changes) joins
    back to each side with Ray's hash-partitioned Dataset.join —
    materialized inputs per the repo's join hygiene notes."""
    import pyarrow.compute as pc

    cls = derive_changes(old, new, id_cols, value_cols).map_batches(
        lambda b: b.filter(pc.not_equal(b["change"], "same")),
        batch_format="pyarrow").materialize()

    def side_rows(side, wanted: list[str]):
        # Acero rejects equal key names on both sides — suffix the
        # classification's keys and drop them after the join
        def pick(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(b["change"], value_set=pa.array(wanted)))
            return b.rename_columns(
                [c + "__r" if c in id_cols else c for c in b.schema.names])

        from ..blocks import _drop_empty_blocks

        sel = _drop_empty_blocks(
            cls.map_batches(pick, batch_format="pyarrow"))
        if sel is None or sel.count() == 0:
            return None
        joined = side.materialize().join(
            sel, join_type="inner", num_partitions=8,
            on=tuple(id_cols), right_on=tuple(c + "__r" for c in id_cols))
        drop = [c + "__r" for c in id_cols]
        return joined.map_batches(
            lambda b: b.drop_columns([c for c in drop
                                      if c in b.schema.names]),
            batch_format="pyarrow")

    out_parts = []
    nm = side_rows(new, ["created", "modified"])
    if nm is not None:
        out_parts.append(nm)
    dels = side_rows(old, ["deleted"])
    if dels is not None:
        def finish_deleted(b: pa.Table) -> pa.Table:
            if increment_version and version_col is not None:
                b = b.set_column(
                    b.schema.get_field_index(version_col), version_col,
                    pc.add(b[version_col], 1))
            if not keep_details:
                for c in value_cols:
                    if c == version_col or c not in b.schema.names:
                        continue
                    b = b.set_column(
                        b.schema.get_field_index(c), c,
                        pa.nulls(b.num_rows, type=b.schema.field(c).type))
            return b

        out_parts.append(dels.map_batches(finish_deleted,
                                          batch_format="pyarrow"))
    if not out_parts:
        return cls  # empty classification, nothing changed
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out


def diff_summary(old, new, id_cols: list[str], value_cols: list[str]) -> dict:
    """diff: counts per class + identical flag (exit code 0 iff identical,
    command_diff.cpp:293-396)."""
    tagged = derive_changes(old, new, id_cols, value_cols)
    counts = {r["change"]: r["count()"] for r in
              tagged.groupby("change").count().take_all()}
    for k in ("created", "deleted", "modified", "same"):
        counts.setdefault(k, 0)
    counts["identical"] = (counts["created"] == 0 and counts["deleted"] == 0
                           and counts["modified"] == 0)
    return counts


def scd2_intervals(ds, key_col: str, ts_col: str, tie_col: str | None = None,
                   carry_cols: list[str] | None = None,
                   end_sentinel: str = "9999-12-31",
                   buckets: int | None = None):
    """Slowly-changing-dimension (SCD2) validity intervals: per key,
    each version's [valid_from, valid_to) where valid_to is the next
    version's timestamp, or the open-ended `end_sentinel` for the
    current version — the warehouse-standard interval build, and the
    output form of the reference's DiffObject validity arithmetic
    (/root/reference/src/command_time_filter.cpp:169-178) exposed as a
    table instead of consumed by a filter.

    Scale shape: ONE hash(key)%buckets shuffle of the narrow
    (key, ts, tie, carry) projection; inside a bucket one lexsort +
    shifted compare computes every successor — the distributed LEAD
    window with no per-key Python. Returns key, carry_cols, valid_from,
    valid_to (timestamp us; the sentinel closes the last interval so no
    NULLs reach a hash compare)."""
    import ray

    from ..functions.hashing import hash_str_u64

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    carry_cols = list(carry_cols or [])
    cols = list(dict.fromkeys([key_col, ts_col]
                              + ([tie_col] if tie_col else []) + carry_cols))
    s = ds.schema()
    types = dict(zip(s.names, s.types))
    sent = np.datetime64(end_sentinel, "us").astype(np.int64)

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        k = t[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_b", pa.array(b))

    def fold(g: pa.Table) -> pa.Table:
        out_fields = [(key_col, types[key_col])] + \
            [(c, types[c]) for c in carry_cols] + \
            [("valid_from", pa.timestamp("us")),
             ("valid_to", pa.timestamp("us"))]
        schema = pa.schema(out_fields)
        if g.num_rows == 0 or key_col not in g.schema.names:
            return schema.empty_table()
        keys = np.asarray(g[key_col].to_pylist())
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if tie_col:
            tie = g[tie_col].to_numpy(zero_copy_only=False)
        elif carry_cols:
            # no explicit tiebreak: derive one from the carry payload so
            # duplicate (key, ts) rows order deterministically (block
            # order varies run to run; a content hash does not)
            comp = ["\x1f".join(map(str, vals))
                    for vals in zip(*(g[c].to_pylist()
                                      for c in carry_cols))]
            tie = hash_str_u64(comp).view(np.int64)
        else:
            tie = np.zeros(len(ts), dtype=np.int64)
        o = np.lexsort((tie, ts, keys.astype(str)))
        keys, ts = keys[o], ts[o]
        same = np.zeros(len(keys), dtype=bool)
        same[:-1] = keys[1:] == keys[:-1]
        succ = np.full(len(ts), sent, dtype=np.int64)
        succ[:-1][same[:-1]] = ts[1:][same[:-1]]
        cols_out = {key_col: pa.array(keys.tolist(), type=types[key_col])}
        for c in carry_cols:
            cols_out[c] = pa.array(
                np.asarray(g[c].to_pylist(), dtype=object)[o].tolist(),
                type=types[c])
        cols_out["valid_from"] = pa.array(ts).cast(pa.timestamp("us"))
        cols_out["valid_to"] = pa.array(succ).cast(pa.timestamp("us"))
        return pa.table(cols_out).cast(schema)

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")
