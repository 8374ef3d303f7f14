"""ID-set operators: getid / removeid / getparents / check-refs / renumber.

Reference semantics (SURVEY.md §2.2, §2.4):

  * getid (/root/reference/src/command_getid.cpp:311-397): copy objects whose
    id is in the requested set; with -r (--add-referenced-objects) first run
    3 closure sub-passes: requested relations pull member relations
    recursively (mark_rel_ids :235-241), then relations pull node/way
    members (:277-295), then ways pull nodes (:297-309). --remove-tags
    strips tags of rows that were only added as references (:360-368).
  * removeid (/root/reference/src/command_removeid.cpp:143-177): anti
    semi-join against the id set.
  * getparents (/root/reference/src/command_getparents.cpp:192-244):
    reverse-reference join — ways containing requested nodes, relations
    containing requested members; --add-self unions the input set.
  * check-refs (/root/reference/src/command_check_refs.cpp:100-324):
    referential-integrity counts — refs whose target id does not exist.
  * renumber (/root/reference/src/command_renumber.cpp:61-131): dense
    order-preserving id remap; refs remapped with the same table.

Shapes: the object stream is the big side (Ray map_batches semi/anti joins
with broadcast id sets); closures are bounded driver loops over the members
adjacency (the reference's own 3-sub-pass structure)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..blocks import _remote_num_rows  # zero-CPU block row counter

from .extract import _collect_small, _collect_table, _isin, _np_str


def parse_id_list(tokens) -> dict[str, np.ndarray]:
    """Parse 'n123 w12 r7'-style id tokens (default type node without
    prefix; /root/reference/src/id_file.cpp:31-50 — comment/whitespace
    stripping, n/w/r prefixes)."""
    out: dict[str, list] = {"node": [], "way": [], "relation": []}
    for tok in tokens:
        tok = tok.strip()
        if not tok or tok.startswith("#"):
            continue
        tok = tok.split()[0]
        kind = {"n": "node", "w": "way", "r": "relation"}.get(tok[0])
        if kind:
            out[kind].append(tok)
        else:
            out["node"].append(tok)
    return {k: np.asarray(sorted(set(v)), dtype=object) for k, v in out.items()}


def ids_from_dataset(ds, id_col: str = "image_id") -> np.ndarray:
    """getid's --id-osm-file form: the requested id set is every id present
    in another dataset (command_getid.cpp id sources)."""
    return np.asarray(sorted(set(ds.select_columns([id_col]).unique(id_col))),
                      dtype=object)


def _refs_of_groups(members, groupset: np.ndarray,
                    mtypes: tuple[str, ...]) -> dict[str, np.ndarray]:
    """Distributed: unique member refs of the given types whose owner is
    in `groupset` (broadcast). ONE scan of the members table; only the
    per-batch-unique matched (mtype, ref) pairs return to the driver —
    bounded by the closure result size, never by the member-table size
    (command_getid.cpp:277-309's member sub-passes at scale)."""
    import ray

    gref = ray.put(np.asarray(groupset, dtype=object))
    mt_arr = np.asarray(list(mtypes), dtype=object)

    def scan(batch: pa.Table) -> pa.Table:
        gs = ray.get(gref)
        mt = _np_str(batch["mtype"])
        hit = _isin(mt, mt_arr) if len(gs) else np.zeros(len(mt), bool)
        if hit.any():
            hit &= _isin(_np_str(batch["group_id"]), gs)
        out = batch.select(["mtype", "ref"]).filter(pa.array(hit))
        if out.num_rows:
            dd = out.group_by(["mtype", "ref"]).aggregate([])
            return dd
        return pa.table({"mtype": pa.array([], type=pa.string()),
                         "ref": pa.array([], type=pa.string())})

    tbl = _collect_table(members.map_batches(scan, batch_format="pyarrow"))
    mt = _np_str(tbl["mtype"])
    ref = _np_str(tbl["ref"])
    return {m: np.unique(ref[mt == m]).astype(object) for m in mtypes}


def semi_join(ds, id_col: str, ids: np.ndarray, invert: bool = False):
    """Distributed (anti-)semi-join of a dataset against a broadcast id set."""
    import ray

    ref = ray.put(np.asarray(ids, dtype=object))

    def f(batch: pa.Table) -> pa.Table:
        idset = ray.get(ref)
        m = _isin(_np_str(batch[id_col]), idset)
        if invert:
            m = ~m
        return batch.filter(pa.array(m))

    return ds.map_batches(f, batch_format="pyarrow")


def getid(images, ids: dict[str, np.ndarray], groups=None, members=None,
          recursive: bool = False, remove_tags: bool = False,
          tag_cols: tuple[str, ...] = ("caption",),
          track_missing: bool = False):
    """Returns {"images_out": Dataset, "group_rows": pa.Table(group_id, kind,
    referenced_only)}. `ids` maps node/way/relation -> requested id arrays.

    remove_tags (--remove-tags, command_getid.cpp:360-368): rows that are
    only in the output because something references them get their tag
    payload stripped (here: `tag_cols` string columns cleared) and a
    `referenced_only` marker column.

    track_missing (--verbose-ids + the found-all exit code,
    command_getid.cpp:119-121, 379-396): additionally report which
    requested ids were NOT found — result keys "missing" (kind ->
    sorted id array) and "found_all" (bool; the reference's exit
    status). The found-id sets come back from distributed scans of the
    requested (small, broadcast) sets only."""
    node_ids = np.asarray(ids.get("node", []), dtype=object)
    way_ids = np.asarray(ids.get("way", []), dtype=object)
    rel_ids = np.asarray(ids.get("relation", []), dtype=object)
    ref_nodes = np.empty(0, dtype=object)
    ref_ways = np.empty(0, dtype=object)
    ref_rels = np.empty(0, dtype=object)

    if recursive and members is not None:
        import pyarrow.compute as _pc

        # sub-pass 1: relations in requested relations, recursive.
        # Only RELATION-member edges reach the driver (relations are a
        # sliver of the member table; way->node rows — the planet-scale
        # bulk — stay distributed, the c13d61c extract.py pattern).
        mem = _collect_small(
            members.map_batches(
                lambda b: b.filter(_pc.equal(b["mtype"], "relation"))
                .select(["group_id", "ref"]), batch_format="pyarrow"),
            ["group_id", "ref"])
        frontier = set(rel_ids.tolist())
        seen: set = set()
        while frontier:
            fsel = _isin(mem["group_id"],
                         np.asarray(list(frontier), dtype=object))
            children = set(mem["ref"][fsel].tolist()) - seen - set(rel_ids.tolist())
            seen |= children
            frontier = children
        ref_rels = np.asarray(sorted(seen), dtype=object)
        # sub-pass 2: node/way members of requested+referenced relations
        # (one distributed scan; only matched unique refs come back)
        all_rels = np.union1d(rel_ids, ref_rels)
        rel_refs = _refs_of_groups(members, all_rels, ("node", "way"))
        ref_nodes = rel_refs["node"]
        ref_ways = rel_refs["way"]
        # sub-pass 3: nodes of requested+referenced ways (distributed)
        all_ways = np.union1d(way_ids, ref_ways)
        way_refs = _refs_of_groups(members, all_ways, ("node",))
        ref_nodes = np.union1d(ref_nodes, way_refs["node"])
        ref_nodes = np.setdiff1d(ref_nodes, node_ids)
        ref_ways = np.setdiff1d(ref_ways, way_ids)

    if not remove_tags:
        images_out = semi_join(images, "image_id",
                               np.union1d(node_ids, ref_nodes))
    else:
        import ray

        sets_ref = ray.put((node_ids, ref_nodes))

        def strip(batch: pa.Table) -> pa.Table:
            req, refd = ray.get(sets_ref)
            bids = _np_str(batch["image_id"])
            m_req = _isin(bids, req)
            m_ref = _isin(bids, refd)
            keep = m_req | m_ref
            out = batch.filter(pa.array(keep))
            ref_only = (m_ref & ~m_req)[keep]
            for c in tag_cols:
                if c in out.schema.names and ref_only.any():
                    vals = np.asarray(out[c].to_pylist(), dtype=object)
                    vals[ref_only] = ""
                    out = out.set_column(out.schema.get_field_index(c), c,
                                         pa.array(vals, type=pa.string()))
            return out.append_column("referenced_only", pa.array(ref_only))

        images_out = images.map_batches(strip, batch_format="pyarrow")

    rows = []
    if groups is not None:
        for gid in way_ids:
            rows.append((gid, "way", False))
        for gid in ref_ways:
            rows.append((gid, "way", True))
        for gid in rel_ids:
            rows.append((gid, "relation", False))
        for gid in ref_rels:
            rows.append((gid, "relation", True))
    group_rows = pa.table({
        "group_id": pa.array([r[0] for r in rows], type=pa.string()),
        "kind": pa.array([r[1] for r in rows], type=pa.string()),
        "referenced_only": pa.array([r[2] for r in rows], type=pa.bool_()),
    })
    out = {"images_out": images_out, "group_rows": group_rows}
    if track_missing:
        from .extract import _collect_table

        found_nodes = _collect_table(
            semi_join(images.select_columns(["image_id"]), "image_id",
                      node_ids))
        missing = {"node": np.setdiff1d(
            node_ids, np.unique(_np_str(found_nodes["image_id"])))}
        for kind, req in (("way", way_ids), ("relation", rel_ids)):
            if groups is not None and len(req):
                import pyarrow.compute as _pc

                of_kind = groups.map_batches(
                    lambda b, kk=kind: b.filter(_pc.equal(b["kind"], kk))
                    .select(["group_id"]), batch_format="pyarrow")
                found = _collect_table(semi_join(of_kind, "group_id", req))
                missing[kind] = np.setdiff1d(
                    req, np.unique(_np_str(found["group_id"])))
            else:
                missing[kind] = np.asarray(sorted(req), dtype=object)
        out["missing"] = missing
        out["found_all"] = all(len(v) == 0 for v in missing.values())
    return out


def removeid(images, ids: np.ndarray, id_col: str = "image_id"):
    return semi_join(images, id_col, ids, invert=True)


def getparents(members, ids: dict[str, np.ndarray], groups=None,
               add_self: bool = False) -> pa.Table:
    """Groups (ways/relations) containing any requested member
    (command_getparents.cpp:192-244). Distributed scan of members with
    broadcast id sets, distinct parent reduce."""
    import ray

    sets_ref = ray.put({k: np.asarray(v, dtype=object) for k, v in ids.items()})

    def scan(batch: pa.Table) -> pa.Table:
        sets = ray.get(sets_ref)
        mt = _np_str(batch["mtype"])
        ref = _np_str(batch["ref"])
        gid = _np_str(batch["group_id"])
        hit = np.zeros(len(mt), dtype=bool)
        for kind, s in sets.items():
            hit |= (mt == kind) & _isin(ref, s)
        parents = np.unique(gid[hit])
        return pa.table({"group_id": pa.array(parents, type=pa.string())})

    rows = members.map_batches(scan, batch_format="pyarrow").take_all()
    parents = np.unique(np.asarray([r["group_id"] for r in rows], dtype=object))
    if add_self:
        extra = np.union1d(np.asarray(ids.get("way", []), dtype=object),
                           np.asarray(ids.get("relation", []), dtype=object))
        parents = np.union1d(parents, extra)
    return pa.table({"group_id": pa.array(parents, type=pa.string())})


_CHECK_REF_CATS = ("nodes_in_ways", "nodes_in_relations",
                   "ways_in_relations", "relations_in_relations")


def check_refs(images, members, groups=None, check_relations: bool = False) -> dict:
    """Counts of dangling references: member refs whose target does not
    exist (command_check_refs.cpp:100-324).

    Scale shape: a bucketed anti-join — member refs (tagged with their
    category) and the existing-id universe (images + groups) are hash-
    bucketed on the key and compared per bucket inside map_groups; only
    4 partial counters per bucket reach the driver. The node-id universe
    is never materialized (the reference warns its in-RAM set needs >32 GB
    at planet scale, man/osmium-check-refs.md; here it stays sharded)."""
    import ray

    from ..functions.hashing import hash_str_u64

    buckets = 64
    # only RELATION ids reach the driver (relations are a sliver of the
    # group universe; ways — the planet-scale bulk — stay distributed)
    rel_gids = np.empty(0, dtype=object)
    if groups is not None:
        import pyarrow.compute as _pc

        g = _collect_small(
            groups.map_batches(
                lambda b: b.filter(_pc.equal(b["kind"], "relation"))
                .select(["group_id"]), batch_format="pyarrow"),
            ["group_id"])
        rel_gids = np.sort(np.asarray(g["group_id"], dtype=object))
    kref = ray.put(rel_gids)

    def bucket_of(vals: pa.ChunkedArray) -> pa.Array:
        b = (hash_str_u64(vals.cast(pa.string()))
             % np.uint64(buckets)).astype(np.int32)
        return pa.array(b)

    def tag_refs(batch: pa.Table) -> pa.Table:
        rels = ray.get(kref)
        mt = _np_str(batch["mtype"])
        gid = _np_str(batch["group_id"])
        owner_rel = _isin(gid, rels) if len(rels) \
            else np.zeros(len(gid), dtype=bool)
        cat = np.full(len(mt), -9, dtype=np.int8)
        cat[(mt == "node") & ~owner_rel] = 0
        cat[(mt == "node") & owner_rel] = 1
        cat[(mt == "way") & owner_rel] = 2
        cat[(mt == "relation") & owner_rel] = 3
        keep = cat >= 0
        out = batch.select(["ref"]).filter(pa.array(keep))
        return pa.table({"_key": out["ref"].cast(pa.string()),
                         "_bucket": bucket_of(out["ref"]),
                         "_cat": pa.array(cat[keep])})

    def tag_ids(cat_code):
        def f(batch: pa.Table) -> pa.Table:
            col = batch.column(0)
            return pa.table({"_key": col.cast(pa.string()),
                             "_bucket": bucket_of(col),
                             "_cat": pa.array(np.full(batch.num_rows, cat_code,
                                                      dtype=np.int8))})
        return f

    sides = [members.map_batches(tag_refs, batch_format="pyarrow"),
             images.select_columns(["image_id"]).map_batches(
                 tag_ids(-1), batch_format="pyarrow")]
    if groups is not None:
        sides.append(groups.select_columns(["group_id"]).map_batches(
            tag_ids(-2), batch_format="pyarrow"))
    unioned = sides[0].union(*sides[1:])

    def count_missing(g: pa.Table) -> pa.Table:
        key = _np_str(g["_key"]).astype(str)
        cat = g["_cat"].to_numpy(zero_copy_only=False)
        node_targets = np.sort(key[cat == -1])
        group_targets = np.sort(key[cat == -2])
        out = {}
        for code, name in enumerate(_CHECK_REF_CATS):
            refs = key[cat == code]
            targets = node_targets if code <= 1 else group_targets
            if len(refs) == 0:
                out[name] = 0
                continue
            if len(targets) == 0:
                out[name] = len(refs)
                continue
            pos = np.searchsorted(targets, refs)
            pos[pos == len(targets)] = len(targets) - 1
            out[name] = int((targets[pos] != refs).sum())
        return pa.table({k: pa.array([v], type=pa.int64()) for k, v in out.items()})

    parts = unioned.groupby("_bucket").map_groups(
        count_missing, batch_format="pyarrow").take_all()
    out = {k: int(sum(r.get(k, 0) for r in parts)) for k in _CHECK_REF_CATS}
    if not check_relations:
        out["ways_in_relations"] = out["relations_in_relations"] = 0
    out["ok"] = all(v == 0 for k, v in out.items() if k != "ok")
    return out


def semi_join_bucketed(ds, id_col: str, ids_ds, ids_col: str | None = None,
                       buckets: int = 64, invert: bool = False):
    """(Anti-)semi-join for id sets too large to broadcast: both sides are
    hash-bucketed on the key and joined per bucket inside map_groups — the
    explicit partitioned hash join (no driver materialization of either
    side). `ids_ds` is a Dataset holding the key set.

    Arrow end-to-end: the per-bucket join runs with batch_format="pyarrow"
    so payload columns never round-trip through pandas (a null-bearing
    int64 would come back float64/object and break bit-exactness). Key-side
    rows carry all-null payload columns only to make the union schemas
    line up; they are dropped before any value leaves the bucket.

    This is the scale path for semi_join/getid/removeid when the id
    universe exceeds worker memory (SURVEY.md §7.3/§8.3)."""
    from ..functions.hashing import hash_str_u64

    ids_col = ids_col or id_col

    payload_schema = ds.schema()
    payload_fields = list(zip(payload_schema.names, payload_schema.types))

    def tag(side, col):
        def f(batch: pa.Table) -> pa.Table:
            vals = batch[col].cast(pa.string())
            b = (hash_str_u64(vals) % np.uint64(buckets)).astype(np.int32)
            out = pa.table({"_key": vals, "_bucket": pa.array(b),
                            "_side": pa.array(np.full(batch.num_rows, side,
                                                      dtype=np.int8))})
            # both sides carry the full payload schema so union() block
            # schemas line up (key-side rows are all-null payloads)
            for name, typ in payload_fields:
                col_arr = batch[name] if side == 0 else pa.nulls(batch.num_rows, typ)
                out = out.append_column(name, col_arr)
            return out
        return f

    big = ds.map_batches(tag(0, id_col), batch_format="pyarrow")
    keys = ids_ds.map_batches(tag(1, ids_col), batch_format="pyarrow")

    drop = ("_key", "_bucket", "_side")

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        key = _np_str(g["_key"])
        keyset = np.unique(key[side == 1])
        rows = g.filter(pa.array(side == 0))
        hit = _isin(_np_str(rows["_key"]), keyset)
        kept = rows.filter(pa.array(~hit if invert else hit))
        return kept.drop_columns(list(drop))

    return big.union(keys).groupby("_bucket").map_groups(
        join_bucket, batch_format="pyarrow")


def renumber_ranked(ds, id_col: str, start: int = 1, out_col: str = "new_id"):
    """Distributed dense order-preserving rank (command_renumber.cpp:61-131
    at scale): distinct ids via a native groupby, global sort, then
    per-block rank = block offset + arange. Only per-block ROW COUNTS
    touch the driver — the mapping stays sharded in the object store as a
    Dataset(id_col, out_col), ready for a bucketed/native join back onto
    any refs table (the range-partitioned rank join from SURVEY.md §7.3)."""
    import ray
    import ray.data as rd

    if start == 0:      # get_start_id: 0 means the default 1
        start = 1
    uniq = ds.select_columns([id_col]).groupby(id_col).count() \
        .select_columns([id_col]).sort(id_col)
    refs = uniq.to_arrow_refs()   # block order == sort order
    counts = np.asarray(ray.get([_remote_num_rows.remote(r) for r in refs]),
                        dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
        if len(counts) else []

    @ray.remote(num_cpus=0)
    def rank_block(tbl: pa.Table, off0: int) -> pa.Table:
        g0 = np.arange(off0, off0 + tbl.num_rows, dtype=np.int64)
        # signed-start formula (_offset_rank): negative starts descend
        ranks = (start - g0) if start < 0 else (g0 + start)
        return tbl.append_column(out_col, pa.array(ranks))

    ranked = [rank_block.remote(r, int(o)) for r, o in zip(refs, offsets)]
    if not ranked:
        return rd.from_arrow(pa.table({id_col: pa.array([], type=pa.string()),
                                       out_col: pa.array([], type=pa.int64())}))
    return rd.from_arrow_refs(ranked)



def _offset_rank(rank: int, start: int) -> int:
    """1-based dense rank -> new id with the reference's signed-start
    formula (command_renumber.cpp:61-66): positive starts count upward
    from `start`, negative starts count DOWNWARD from `start`; start 0
    means the default 1 (get_start_id, :139-146)."""
    if start == 0:
        start = 1
    if start < 0:
        return -rank + start + 1
    return rank + start - 1


def renumber(ds, id_col: str, start: int = 1, out_col: str | None = None):
    """Dense order-preserving remap: sorted distinct old ids -> start..N
    (command_renumber.cpp:61-131; signed/zero starts per _offset_rank).
    The mapping table is built from a distributed distinct then
    broadcast; refs in other tables can be remapped with `remap_refs`
    using the same table. Scale path: `renumber_ranked` keeps the mapping
    sharded (no driver dict) for id universes past driver memory."""
    import ray

    uniq = np.unique(np.asarray(ds.select_columns([id_col]).unique(id_col),
                                dtype=object))
    mapping = {v: _offset_rank(i + 1, start) for i, v in enumerate(uniq.tolist())}
    mref = ray.put(mapping)
    col = out_col or id_col

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(mref)
        vals = _np_str(batch[id_col])
        new = pa.array([m[v] for v in vals.tolist()], type=pa.int64())
        if col in batch.schema.names:
            return batch.set_column(batch.schema.get_field_index(col), col, new)
        return batch.append_column(col, new)

    return ds.map_batches(remap, batch_format="pyarrow"), mapping


def renumber_with_refs(images, groups, members, start: int = 1,
                       starts: dict | None = None,
                       types: tuple = ("node", "way", "relation")):
    """Full renumber: images (nodes), ways, relations each get an
    independent dense id space (the reference numbers each type
    separately, command_renumber.cpp:61-66), and group_members
    refs/owners are rewritten with the same mappings.

    starts: per-kind start ids (`--start-id n,w,r`; signed/zero per
    _offset_rank), overriding `start`. types: kinds to renumber
    (`--object-type`); refs to un-renumbered kinds keep their old ids
    (new_* columns null). Refs to a renumbered kind whose target id was
    never seen EXTEND that kind's mapping past its known universe
    (command_renumber.cpp:68-86 m_extra_ids) — in sorted order of the
    unknown ids, the deterministic stand-in for the reference's
    file-encounter order, which an unordered Dataset cannot honour.

    Returns (images_out, groups_out, members_out, mappings) where mappings
    maps kind -> {old_id: new_int}."""
    import ray

    st = {k: start for k in ("node", "way", "relation")}
    st.update(starts or {})

    g = _collect_small(groups, ["group_id", "kind"])
    mappings: dict = {}
    if "node" in types:
        images_out, node_map = renumber(images, "image_id", st["node"],
                                        out_col="new_id")
        mappings["node"] = node_map
    else:
        images_out = images
    for kind in ("way", "relation"):
        if kind in types:
            kind_ids = np.unique(g["group_id"][g["kind"] == kind])
            mappings[kind] = {v: _offset_rank(i + 1, st[kind])
                              for i, v in enumerate(kind_ids.tolist())}

    # unknown refs of renumbered kinds extend that kind's map (sorted)
    import pyarrow.compute as _pc

    def _ref_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"mtype": b["mtype"], "ref": b["ref"]})
        return t.group_by(["mtype", "ref"]).aggregate([])

    seen = _collect_table(members.map_batches(_ref_partial,
                                              batch_format="pyarrow")) \
        .group_by(["mtype", "ref"]).aggregate([])
    mt_all = _np_str(seen["mtype"])
    ref_all = _np_str(seen["ref"])
    for kind in types:
        m = mappings[kind]
        refs_k = ref_all[mt_all == kind]
        unknown = sorted(set(refs_k.tolist()) - set(m))
        for v in unknown:
            m[v] = _offset_rank(len(m) + 1, st[kind])  # rank continues past
            # the known universe, one fresh id per unseen ref

    # owner kind comes from the groups table, not an id-prefix heuristic
    # (group ids need not follow the w/r naming convention). Maps ship
    # as (sorted-key array, aligned values) so lookups are vectorized
    # searchsorted probes, not per-row dict.get loops.
    packed = {}
    for k, m in mappings.items():
        keys = np.asarray(sorted(m), dtype=str)
        vals = np.asarray([m[x] for x in keys], dtype=np.int64)
        packed[k] = (keys, vals)
    ow_keys = np.asarray(g["group_id"], dtype=str)
    ow_order = np.argsort(ow_keys)
    ow_keys = ow_keys[ow_order]
    ow_kinds = np.asarray(g["kind"], dtype=str)[ow_order]
    mref = ray.put(packed)
    kind_ref = ray.put((ow_keys, ow_kinds))

    def _probe(keys: np.ndarray, vals: np.ndarray, q: np.ndarray):
        """(values, found_mask) of q against a sorted key array."""
        if len(keys) == 0 or len(q) == 0:
            return np.zeros(len(q), dtype=np.int64), np.zeros(len(q), bool)
        pos = np.searchsorted(keys, q)
        ok = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == q)
        return vals[np.minimum(pos, len(keys) - 1)], ok

    def _remap_by_kind(m: dict, kinds: np.ndarray, ids: np.ndarray):
        out = np.zeros(len(ids), dtype=np.int64)
        ok = np.zeros(len(ids), dtype=bool)
        for k, (keys, vals) in m.items():
            sel = kinds == k
            if sel.any():
                v, f = _probe(keys, vals, ids[sel])
                out[sel] = np.where(f, v, 0)
                ok[sel] = f
        return pa.array(out, type=pa.int64(), mask=~ok)

    def remap_groups(batch: pa.Table) -> pa.Table:
        m = ray.get(mref)
        gid = _np_str(batch["group_id"]).astype(str)
        kind = _np_str(batch["kind"]).astype(str)
        return batch.append_column("new_id", _remap_by_kind(m, kind, gid))

    def remap_members(batch: pa.Table) -> pa.Table:
        m = ray.get(mref)
        ow_k, ow_v = ray.get(kind_ref)
        gid = _np_str(batch["group_id"]).astype(str)
        mt = _np_str(batch["mtype"]).astype(str)
        ref = _np_str(batch["ref"]).astype(str)
        pos = np.searchsorted(ow_k, gid) if len(ow_k) else None
        if pos is None:
            owner_kind = np.full(len(gid), "way", dtype=object)
        else:
            pos_c = np.minimum(pos, max(len(ow_k) - 1, 0))
            found = (pos < len(ow_k)) & (ow_k[pos_c] == gid)
            owner_kind = np.where(found, ow_v[pos_c], "way").astype(str)
        batch = batch.append_column(
            "new_group_id", _remap_by_kind(m, owner_kind, gid))
        return batch.append_column("new_ref", _remap_by_kind(m, mt, ref))

    groups_out = groups.map_batches(remap_groups, batch_format="pyarrow")
    members_out = members.map_batches(remap_members, batch_format="pyarrow")
    return images_out, groups_out, members_out, mappings


def semi_join_bloom(ds, id_col: str, ids_ds, ids_col: str | None = None,
                    n_bits: int = 1 << 20, k: int = 4, seed: int = 0,
                    buckets: int = 16, invert: bool = False,
                    exact: bool = True):
    """(Anti-)semi-join with a Bloom prefilter — the 10^12-row scale path
    for getid/removeid when the wanted-id set is too large to broadcast
    exactly (the reference's per-extract IdSetDense bitsets are the
    single-process analogue, man/osmium-extract.md:382-387).

    Shape: the id set folds into ONE fixed-size bitmap (tree-reduced
    partials, stages/sketches.bloom_build) shipped once via ray.put; every
    map task then prunes its batch with a vectorized k-probe — definite
    misses never enter the exact join. Only the surviving candidates (true
    hits + the ~(1-e^{-kn/m})^k false-positive sliver) go through the
    bucketed hash join for exact verification, so the all-to-all exchange
    runs over a small fraction of the input.

    invert=True (removeid): Bloom definite-misses are KEPT outright
    (no false negatives => they are provably not in the set); only
    bloom-hits go through the exact anti-join, and the two streams union.

    exact=False returns the pruned candidates without verification
    (approximate contains-join; false positives possible, no misses)."""
    from ..stages.sketches import bloom_build, bloom_might_contain
    import ray

    ids_col = ids_col or id_col
    words = bloom_build(ids_ds, ids_col, n_bits=n_bits, k=k, seed=seed)
    words_ref = ray.put(words)

    def prune(keep_hits: bool):
        def f(batch: pa.Table) -> pa.Table:
            w = ray.get(words_ref)
            hit = bloom_might_contain(w, batch[id_col].cast(pa.string()),
                                      n_bits, k=k, seed=seed)
            return batch.filter(pa.array(hit if keep_hits else ~hit))
        return f

    candidates = ds.map_batches(prune(True), batch_format="pyarrow")
    if not exact:
        return candidates
    verified = semi_join_bucketed(candidates, id_col, ids_ds,
                                  ids_col=ids_col, buckets=buckets,
                                  invert=invert)
    if not invert:
        return verified
    definite_miss = ds.map_batches(prune(False), batch_format="pyarrow")
    return definite_miss.union(verified)
