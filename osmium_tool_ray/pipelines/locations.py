"""Node-location index operators:

  * add_locations_to_members — the add-locations-to-ways equivalent
    (/root/reference/src/command_add_locations_to_ways.cpp:178-236): enrich
    each way member ref with its node's lon/lat (N:1 lookup join).
  * create_locations_index / lookup_locations — the
    create-locations-index / query-locations-index pair
    (/root/reference/src/command_create_locations_index.cpp:102-141 on-disk
    dense array; command_query_locations_index.cpp:119-161 point lookup):
    here a sorted parquet lookup table + filter-pushdown point reads.

Join shape: the location table ships once per worker as sorted arrays
(ray.put broadcast + searchsorted per batch) WHILE it fits under
`broadcast_cap` rows; above the cap add_locations_to_members
auto-routes to the bucketed hash-partitioned searchsorted join
(add_locations_bucketed) — the reference likewise selects its index
strategy by scale (--index-type,
command_add_locations_to_ways.cpp:188-196 / man/osmium-index-types.md)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _location_arrays(images, id_col="image_id", lon_col="lon", lat_col="lat"):
    import ray

    tbls = [t for t in ray.get(
        images.select_columns([id_col, lon_col, lat_col])
        .to_arrow_refs()) if t.num_rows]
    if not tbls:
        return (np.empty(0, dtype=str), np.empty(0, np.float64),
                np.empty(0, np.float64))
    t = pa.concat_tables(tbls)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(str)
    lon = t[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
    lat = t[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], lon[order], lat[order]


def add_locations_to_members(members, images, keep_missing: bool = False,
                             broadcast_cap: int = 5_000_000):
    """members(group_id, seq, mtype, ref) x images(image_id, lon, lat) ->
    members + (lon, lat); node-type members only. Missing refs are dropped
    (or kept as nulls with keep_missing). Location sides above
    `broadcast_cap` rows never touch the driver: the call auto-routes to
    add_locations_bucketed (identical output, hash-bucket shuffle)."""
    import ray

    if images.count() > broadcast_cap:
        return add_locations_bucketed(members, images,
                                      keep_missing=keep_missing)

    ids, lon, lat = _location_arrays(images)
    ref = ray.put((ids, lon, lat))

    def enrich(batch: pa.Table) -> pa.Table:
        sids, slon, slat = ray.get(ref)
        mt = batch["mtype"].to_numpy(zero_copy_only=False).astype(str)
        refs = batch["ref"].to_numpy(zero_copy_only=False).astype(str)
        is_node = mt == "node"
        pos = np.searchsorted(sids, refs)
        pos_c = np.minimum(pos, len(sids) - 1) if len(sids) else pos
        found = is_node & (len(sids) > 0) & (sids[pos_c] == refs)
        out_lon = np.where(found, slon[pos_c] if len(sids) else 0.0, np.nan)
        out_lat = np.where(found, slat[pos_c] if len(sids) else 0.0, np.nan)
        batch = batch.append_column("lon", pa.array(out_lon))
        batch = batch.append_column("lat", pa.array(out_lat))
        if not keep_missing:
            batch = batch.filter(pa.array(found))
        return batch

    return members.map_batches(enrich, batch_format="pyarrow")


def add_locations_bucketed(members, images, keep_missing: bool = False,
                           buckets: int = 64):
    """add_locations_to_members' scale path: both sides hash-partition by
    the join key (ref == image_id) into `buckets` groups; each group does
    the same sorted-searchsorted attach the broadcast path does per batch.
    No driver materialization, no broadcast — the location side rides ONE
    narrow (id, lon, lat) shuffle. Output columns and semantics match the
    broadcast variant exactly (node-type members only; missing refs
    dropped, or kept as null lon/lat with keep_missing)."""
    import ray
    from ..functions.hashing import hash_str_u64
    from ..blocks import _drop_empty_blocks

    m_schema = members.schema()
    m_names = list(m_schema.names)
    m_types = dict(zip(m_schema.names, m_schema.types))
    out_fields = [(n, m_types[n]) for n in m_names] + \
        [("lon", pa.float64()), ("lat", pa.float64())]
    out_schema = pa.schema(out_fields)

    def tag_members(batch: pa.Table) -> pa.Table:
        b = (hash_str_u64(batch["ref"].cast(pa.string()))
             % np.uint64(buckets)).astype(np.int32)
        n = batch.num_rows
        batch = batch.append_column("lon", pa.nulls(n, pa.float64()))
        batch = batch.append_column("lat", pa.nulls(n, pa.float64()))
        batch = batch.append_column("_b", pa.array(b))
        return batch.append_column(
            "_side", pa.array(np.zeros(n, dtype=np.int8)))

    def tag_locs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for name in m_names:
            if name == "ref":
                cols[name] = batch["image_id"].cast(m_types["ref"])
            else:
                cols[name] = pa.nulls(n, m_types[name])
        cols["lon"] = batch["lon"].cast(pa.float64())
        cols["lat"] = batch["lat"].cast(pa.float64())
        b = (hash_str_u64(batch["image_id"].cast(pa.string()))
             % np.uint64(buckets)).astype(np.int32)
        cols["_b"] = pa.array(b)
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    def join_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_side" not in g.schema.names:
            return out_schema.empty_table()
        side = g["_side"].to_numpy(zero_copy_only=False)
        refs = g["ref"].to_numpy(zero_copy_only=False).astype(str)
        lrows = np.flatnonzero(side == 1)
        mrows = np.flatnonzero(side == 0)
        if not len(mrows):
            return out_schema.empty_table()
        lids = refs[lrows]
        o = np.argsort(lids, kind="stable")
        lids = lids[o]
        slon = g["lon"].to_numpy(zero_copy_only=False)[lrows][o]
        slat = g["lat"].to_numpy(zero_copy_only=False)[lrows][o]
        mt = g["mtype"].to_numpy(zero_copy_only=False).astype(str)[mrows]
        mrefs = refs[mrows]
        is_node = mt == "node"
        if len(lids):
            pos_c = np.minimum(np.searchsorted(lids, mrefs),
                               len(lids) - 1)
            found = is_node & (lids[pos_c] == mrefs)
            out_lon = np.where(found, slon[pos_c], np.nan)
            out_lat = np.where(found, slat[pos_c], np.nan)
        else:
            found = np.zeros(len(mrefs), dtype=bool)
            out_lon = np.full(len(mrefs), np.nan)
            out_lat = np.full(len(mrefs), np.nan)
        sub = g.take(pa.array(mrows)).select(m_names)
        sub = sub.append_column("lon", pa.array(out_lon))
        sub = sub.append_column("lat", pa.array(out_lat))
        if not keep_missing:
            sub = sub.filter(pa.array(found))
        return sub

    locs = images.select_columns(["image_id", "lon", "lat"])
    tagged = members.map_batches(tag_members, batch_format="pyarrow") \
        .union(locs.map_batches(tag_locs, batch_format="pyarrow"))
    out = _drop_empty_blocks(
        tagged.groupby("_b").map_groups(join_group,
                                        batch_format="pyarrow"))
    if out is None:
        return ray.data.from_arrow(out_schema.empty_table())
    return out


def retained_nodes(images, tagged_col: str = "tagged",
                   members=None, groups=None, keep_all: bool = False,
                   id_col: str = "image_id"):
    """Node retention after locations are embedded into ways
    (command_add_locations_to_ways.cpp run/copy_data + find_member_nodes
    :150-176): by default only TAGGED nodes stay in the output (their
    locations now live on the way members); -n (keep_all) keeps every
    node; --keep-member-nodes additionally keeps nodes referenced from
    RELATIONS — pass members plus the groups table, whose `kind` column
    identifies relation owners (never an id-prefix heuristic). The
    relation id set is group metadata (small); member node refs are
    gathered with a distributed per-batch unique, then broadcast."""
    import ray

    if keep_all:
        return images
    member_ids = np.empty(0, dtype=object)
    if members is not None:
        import pyarrow.compute as pc

        rel_ids = np.empty(0, dtype=object)
        if groups is not None:
            rel_rows = [t for t in ray.get(
                groups.map_batches(
                    lambda b: b.filter(pc.equal(b["kind"], "relation"))
                    .select(["group_id"]), batch_format="pyarrow")
                .to_arrow_refs()) if t.num_rows]
            if rel_rows:
                rel_ids = np.unique(np.asarray(
                    pa.concat_tables(rel_rows)["group_id"].to_pylist(),
                    dtype=object).astype(str)).astype(object)
        rel_ref = ray.put(rel_ids)

        def node_refs(batch: pa.Table) -> pa.Table:
            rids = ray.get(rel_ref)
            sel = pc.equal(batch["mtype"], "node").to_numpy(
                zero_copy_only=False)
            if len(rids):
                gid = np.asarray(batch["group_id"].to_pylist(),
                                 dtype=object).astype(str)
                pos = np.minimum(np.searchsorted(rids.astype(str), gid),
                                 len(rids) - 1)
                sel &= rids.astype(str)[pos] == gid
            return pa.table({"ref": pc.unique(
                batch.filter(pa.array(sel))["ref"])})

        parts = [t for t in ray.get(
            members.map_batches(node_refs, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
        if parts:
            member_ids = np.unique(np.asarray(
                pa.concat_tables(parts)["ref"].to_pylist(), dtype=object)
                .astype(str)).astype(object)
    ref = ray.put(member_ids)

    def keep(batch: pa.Table) -> pa.Table:
        mids = ray.get(ref)
        tagged = batch[tagged_col].to_numpy(zero_copy_only=False).astype(bool)
        if len(mids):
            ids = np.asarray(batch[id_col].to_pylist(), dtype=object).astype(str)
            pos = np.minimum(np.searchsorted(mids.astype(str), ids),
                             len(mids) - 1)
            tagged = tagged | (mids.astype(str)[pos] == ids)
        return batch.filter(pa.array(tagged))

    return images.map_batches(keep, batch_format="pyarrow")


def add_locations_native_join(members, images, num_partitions: int = 16):
    """The no-broadcast variant of add_locations_to_members: Ray's native
    hash-partitioned Dataset.join (inner, on ref == image_id) — use when
    the node table exceeds worker memory. Node-type members only; column
    set matches the broadcast variant."""
    import pyarrow as pa
    import pyarrow.compute as pc

    nodes_only = members.map_batches(
        lambda b: b.filter(pc.equal(b["mtype"], "node")), batch_format="pyarrow")
    locs = images.select_columns(["image_id", "lon", "lat"])
    joined = nodes_only.join(locs, join_type="inner",
                             num_partitions=num_partitions,
                             on=("ref",), right_on=("image_id",))
    keep = [c for c in ("group_id", "seq", "mtype", "ref", "lon", "lat")]
    return joined.select_columns(keep)


def apply_location_changes(located_members, change_nodes,
                           id_col: str = "image_id", op_col: str = "op"):
    """apply-changes --locations-on-ways
    (/root/reference/src/command_apply_changes.cpp:200-277): way-member
    rows that carry node locations get those locations patched from the
    change file's nodes — modified nodes overwrite lon/lat in place,
    members referencing deleted nodes are dropped (their location becomes
    undefined). `change_nodes` is a Dataset of (id_col, lon, lat, op)
    with op in {'modify', 'delete'}.

    Join shape: the change set is the small side (a change file vs the
    full located stream) — broadcast as sorted arrays, searchsorted per
    batch; swap in the bucketed hash join for TB-scale change sets
    (SURVEY.md §7.3)."""
    import ray

    rows = change_nodes.select_columns([id_col, "lon", "lat", op_col]).take_all()
    ids = np.asarray([r[id_col] for r in rows], dtype=object).astype(str)
    lon = np.asarray([r["lon"] for r in rows], dtype=np.float64)
    lat = np.asarray([r["lat"] for r in rows], dtype=np.float64)
    deleted = np.asarray([r[op_col] == "delete" for r in rows], dtype=bool)
    order = np.argsort(ids, kind="stable")
    # the reference applies change inputs in order, so a later change to
    # the same node overrides an earlier one (modify-then-delete deletes):
    # stable sort keeps input order within equal ids — keep each run's LAST
    last = np.ones(len(order), dtype=bool)
    if len(order):
        sorted_ids = ids[order]
        last[:-1] = sorted_ids[1:] != sorted_ids[:-1]
    keep = order[last]
    ref = ray.put((ids[keep], lon[keep], lat[keep], deleted[keep]))

    def patch(batch: pa.Table) -> pa.Table:
        sids, slon, slat, sdel = ray.get(ref)
        refs = np.asarray(batch["ref"].to_pylist(), dtype=object).astype(str)
        if len(sids) == 0:
            return batch
        pos = np.searchsorted(sids, refs)
        pos_c = np.minimum(pos, len(sids) - 1)
        found = sids[pos_c] == refs
        drop = found & sdel[pos_c]
        modify = found & ~sdel[pos_c]
        out_lon = np.where(modify, slon[pos_c],
                           batch["lon"].to_numpy(zero_copy_only=False))
        out_lat = np.where(modify, slat[pos_c],
                           batch["lat"].to_numpy(zero_copy_only=False))
        batch = batch.set_column(batch.schema.get_field_index("lon"), "lon",
                                 pa.array(out_lon))
        batch = batch.set_column(batch.schema.get_field_index("lat"), "lat",
                                 pa.array(out_lat))
        return batch.filter(pa.array(~drop))

    return located_members.map_batches(patch, batch_format="pyarrow")


def create_locations_index(images, out_path: str,
                           id_col="image_id", lon_col="lon", lat_col="lat") -> str:
    """Materialize a sorted (id -> lon, lat) parquet lookup table — the
    dense_file_array analogue; sorted layout gives row-group pruning on
    point lookups."""
    images.select_columns([id_col, lon_col, lat_col]).sort(id_col) \
        .write_parquet(out_path)
    return out_path


def lookup_locations(index_path: str, ids: list[str],
                     id_col: str = "image_id") -> pa.Table:
    """Point lookups against the on-disk index with predicate pushdown
    (query-locations-index equivalent)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    dset = pads.dataset(index_path, format="parquet")
    return dset.to_table(filter=pc.field(id_col).isin(list(ids)))
