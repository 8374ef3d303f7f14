"""Extract strategies (simple / complete_ways / smart) over the image corpus
+ group adjacency tables — the Ray Data restatement of
/root/reference/src/extract/strategy_{simple,complete_ways,smart}.cpp.

Data model (SURVEY.md §1.3): `images` rows are the "nodes" (point + payload);
`groups(group_id, kind, tags)` + `group_members(group_id, seq, mtype, ref)`
re-express ways/relations. Semantics ported per strategy:

simple (strategy_simple.cpp:64-106, one pass):
  * node inside region -> emit, record id
  * way with >=1 member node recorded -> emit, record id
  * relation: decided by its FIRST node/way-type member only (the loop
    `return`s inside the node/way switch arms, :89-106) — emitted iff that
    member's id was recorded; relation-type members are skipped.

complete_ways (strategy_complete_ways.cpp:83-162 + parent closure :36-43):
  * pass 1 records node_ids inside; ways with >=1 recorded node -> way_ids +
    ALL their refs as extra_node_ids; relations with ANY node/way member
    recorded -> relation_ids; then the recursive member->parent relation
    closure; pass 2 emits nodes in node|extra, ways in way_ids, relations in
    relation_ids.

smart (strategy_smart.cpp:203-241 + passes :257-296):
  * like complete_ways for nodes/ways; a relation with >=1 wanted member is
    recorded, and if it passes the type filter (default types={multipolygon},
    `-S types=`) AND the tag filter (default: has >=1 tag) ALL its node/way
    members become extra ids; a relation whose wanted-member percentage
    reaches `complete-partial-relations` likewise (post-loop, :235-237);
    pass 2 pulls node refs of way_ids|extra_way_ids; pass 3 emits the union.

Distribution notes (scale path, SURVEY.md §4.3): the spatial join over
`images` is the 100TB-scale pass — it runs as a RegionMatcher actor pool,
single pass, all extracts at once. Member/relation closure passes run as
broadcast semi-joins (`ray.put` id sets, `map_batches` isin) over the
adjacency datasets; matched group ids are reduced to the driver (narrow
2-column results — the distributed analogue of the reference's in-RAM
IdSetDense bitsets, man/osmium-extract.md:382-387). The rel->rel parent
closure collects only the relation->relation edge list (tiny in practice;
for adversarial graphs swap in the bucketed-join fixpoint documented in
SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..stages.extract import RegionMatcher
from ..state.regions import Region
from ..registry import get_strategy, register_strategy


def _np_str(col) -> np.ndarray:
    return np.asarray(col.to_pylist() if hasattr(col, "to_pylist") else col, dtype=object)


def _collect_table(ds) -> pa.Table:
    """Materialize a (narrow) Dataset as one Arrow table — no per-row dict
    conversion (take_all builds Python dicts; this stays columnar)."""
    import ray

    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        return pa.Table.from_batches([], schema=pa.schema(
            [(n, t) for n, t in zip(ds.schema().names, ds.schema().types)]))
    return pa.concat_tables(tables, promote_options="default")


def _isin(values: np.ndarray, idset: np.ndarray) -> np.ndarray:
    """String-set membership via fixed-width-unicode searchsorted — ~1000x
    faster than np.isin on object arrays (which falls back to per-element
    Python compares)."""
    if idset is None or len(idset) == 0:
        return np.zeros(len(values), dtype=bool)
    a = np.asarray(values).astype(str)
    b = np.sort(np.asarray(idset).astype(str))
    pos = np.searchsorted(b, a)
    pos[pos == len(b)] = len(b) - 1
    return b[pos] == a


@dataclass
class ExtractSets:
    """Per-extract id sets (the IdSetDense analogue)."""

    n_extracts: int
    node_ids: list[np.ndarray] = field(default_factory=list)
    extra_node_ids: list[np.ndarray] = field(default_factory=list)
    way_ids: list[np.ndarray] = field(default_factory=list)
    extra_way_ids: list[np.ndarray] = field(default_factory=list)
    relation_ids: list[np.ndarray] = field(default_factory=list)

    def __post_init__(self):
        empty = lambda: [np.empty(0, dtype=object) for _ in range(self.n_extracts)]
        for f in ("node_ids", "extra_node_ids", "way_ids", "extra_way_ids", "relation_ids"):
            if not getattr(self, f):
                setattr(self, f, empty())


def _matched_node_ids(images, regions, level: int, concurrency) -> list[np.ndarray]:
    """Distributed pass 1: ids of images inside each region (single pass,
    all extracts — replaces E sequential scans)."""
    import ray

    from ..stages.extract import region_match_batches

    narrow = images.select_columns(["image_id", "lon", "lat"])
    regions_ref = ray.put(regions)
    matched = region_match_batches(narrow, regions_ref, level) \
        .select_columns(["image_id", "extract_id"])
    tbl = _collect_table(matched)
    ids = _np_str(tbl["image_id"])
    eids = tbl["extract_id"].to_numpy(zero_copy_only=False)
    return [np.unique(ids[eids == e]).astype(object) for e in range(len(regions))]


def _member_hits(members, idsets: list[np.ndarray], mtype: str,
                 kind_of: dict[str, str], want_kind: str) -> list[np.ndarray]:
    """Distributed semi-join: group ids (of kind `want_kind`) having >=1
    member of `mtype` whose ref is in idsets[e]. Broadcast id sets, scan the
    members dataset once, reduce distinct (group_id, e) pairs."""
    import ray

    refs = ray.put(idsets)
    kinds = ray.put(kind_of)

    def scan(batch: pa.Table) -> pa.Table:
        sets = ray.get(refs)
        kmap = ray.get(kinds)
        mt = _np_str(batch["mtype"])
        gid = _np_str(batch["group_id"])
        ref = _np_str(batch["ref"])
        sel = mt == mtype
        out_g, out_e = [], []
        for e, s in enumerate(sets):
            hit = sel & _isin(ref, s)
            if hit.any():
                g = gid[hit]
                gk = np.asarray([kmap.get(x) == want_kind for x in g])
                g = np.unique(g[gk])
                out_g.append(g)
                out_e.append(np.full(len(g), e, dtype=np.int32))
        if not out_g:
            return pa.table({"group_id": pa.array([], type=pa.string()),
                             "extract_id": pa.array([], type=pa.int32())})
        return pa.table({"group_id": pa.array(np.concatenate(out_g), type=pa.string()),
                         "extract_id": pa.array(np.concatenate(out_e))})

    tbl = _collect_table(members.map_batches(scan, batch_format="pyarrow"))
    gids = _np_str(tbl["group_id"])
    eids = tbl["extract_id"].to_numpy(zero_copy_only=False)
    return [np.unique(gids[eids == e]).astype(object) for e in range(len(idsets))]


def _member_refs_of(members, groupsets: list[np.ndarray],
                    mtypes: tuple[str, ...] = ("node",)) -> list[np.ndarray]:
    """Distributed: refs (of the given member types) of all groups in
    groupsets[e]."""
    import ray

    gref = ray.put(groupsets)

    def scan(batch: pa.Table) -> pa.Table:
        sets = ray.get(gref)
        mt = _np_str(batch["mtype"])
        gid = _np_str(batch["group_id"])
        ref = _np_str(batch["ref"])
        sel = _isin(mt, np.asarray(mtypes, dtype=object))
        out_r, out_e = [], []
        for e, s in enumerate(sets):
            hit = sel & _isin(gid, s)
            if hit.any():
                r = np.unique(ref[hit])
                out_r.append(r)
                out_e.append(np.full(len(r), e, dtype=np.int32))
        if not out_r:
            return pa.table({"ref": pa.array([], type=pa.string()),
                             "extract_id": pa.array([], type=pa.int32())})
        return pa.table({"ref": pa.array(np.concatenate(out_r), type=pa.string()),
                         "extract_id": pa.array(np.concatenate(out_e))})

    tbl = _collect_table(members.map_batches(scan, batch_format="pyarrow"))
    rr = _np_str(tbl["ref"])
    ee = tbl["extract_id"].to_numpy(zero_copy_only=False)
    return [np.unique(rr[ee == e]).astype(object) for e in range(len(groupsets))]


def _member_hits_by_kind(members, idsets: list[np.ndarray], mtype: str,
                         kind_of: dict[str, str],
                         want_kinds=("way", "relation")) -> dict:
    """Fused variant of _member_hits: ONE distributed scan of the members
    dataset yields the matched group ids for EVERY owner kind at once
    (complete_ways needs node->way and node->relation hits over the same
    id sets — scanning twice doubles the most expensive pass)."""
    import ray

    refs = ray.put(idsets)
    kinds = ray.put(kind_of)

    def scan(batch: pa.Table) -> pa.Table:
        sets = ray.get(refs)
        kmap = ray.get(kinds)
        mt = _np_str(batch["mtype"])
        gid = _np_str(batch["group_id"])
        ref = _np_str(batch["ref"])
        sel = mt == mtype
        out_k, out_g, out_e = [], [], []
        for e, s in enumerate(sets):
            hit = sel & _isin(ref, s)
            if not hit.any():
                continue
            g = np.unique(gid[hit])
            gk = np.asarray([kmap.get(x, "") for x in g], dtype=object)
            for k in want_kinds:
                gsel = g[gk == k]
                if len(gsel):
                    out_k.append(np.full(len(gsel), k, dtype=object))
                    out_g.append(gsel)
                    out_e.append(np.full(len(gsel), e, dtype=np.int32))
        if not out_g:
            return pa.table({"kind": pa.array([], type=pa.string()),
                             "group_id": pa.array([], type=pa.string()),
                             "extract_id": pa.array([], type=pa.int32())})
        return pa.table({
            "kind": pa.array(np.concatenate(out_k), type=pa.string()),
            "group_id": pa.array(np.concatenate(out_g), type=pa.string()),
            "extract_id": pa.array(np.concatenate(out_e))})

    tbl = _collect_table(members.map_batches(scan, batch_format="pyarrow"))
    kk = _np_str(tbl["kind"])
    gg = _np_str(tbl["group_id"])
    ee = tbl["extract_id"].to_numpy(zero_copy_only=False)
    return {k: [np.unique(gg[(kk == k) & (ee == e)]).astype(object)
                for e in range(len(idsets))]
            for k in want_kinds}


def _refs_and_parent_hits(members, way_sets: list[np.ndarray],
                          kind_of: dict[str, str],
                          ref_mtypes=("node",)) -> tuple[list, list]:
    """Fused variant of (_member_refs_of + _member_hits): ONE scan yields
    (a) refs of the given member types owned by groups in way_sets[e] and
    (b) relation ids having a way-type member in way_sets[e]."""
    import ray

    gref = ray.put(way_sets)
    kinds = ray.put(kind_of)

    def scan(batch: pa.Table) -> pa.Table:
        sets = ray.get(gref)
        kmap = ray.get(kinds)
        mt = _np_str(batch["mtype"])
        gid = _np_str(batch["group_id"])
        ref = _np_str(batch["ref"])
        ref_sel = _isin(mt, np.asarray(ref_mtypes, dtype=object))
        way_member = mt == "way"
        out_t, out_v, out_e = [], [], []
        for e, s in enumerate(sets):
            hit_refs = ref_sel & _isin(gid, s)
            if hit_refs.any():
                r = np.unique(ref[hit_refs])
                out_t.append(np.full(len(r), "ref", dtype=object))
                out_v.append(r)
                out_e.append(np.full(len(r), e, dtype=np.int32))
            hit_par = way_member & _isin(ref, s)
            if hit_par.any():
                p = np.unique(gid[hit_par])
                pk = np.asarray([kmap.get(x) == "relation" for x in p])
                p = p[pk]
                if len(p):
                    out_t.append(np.full(len(p), "rel", dtype=object))
                    out_v.append(p)
                    out_e.append(np.full(len(p), e, dtype=np.int32))
        if not out_v:
            return pa.table({"tag": pa.array([], type=pa.string()),
                             "value": pa.array([], type=pa.string()),
                             "extract_id": pa.array([], type=pa.int32())})
        return pa.table({
            "tag": pa.array(np.concatenate(out_t), type=pa.string()),
            "value": pa.array(np.concatenate(out_v), type=pa.string()),
            "extract_id": pa.array(np.concatenate(out_e))})

    tbl = _collect_table(members.map_batches(scan, batch_format="pyarrow"))
    tt = _np_str(tbl["tag"])
    vv = _np_str(tbl["value"])
    ee = tbl["extract_id"].to_numpy(zero_copy_only=False)
    E = len(way_sets)
    refs_out = [np.unique(vv[(tt == "ref") & (ee == e)]).astype(object)
                for e in range(E)]
    rels_out = [np.unique(vv[(tt == "rel") & (ee == e)]).astype(object)
                for e in range(E)]
    return refs_out, rels_out


def _collect_small(ds, columns):
    """Collect a narrow projection of a (small, metadata-class) dataset."""
    if ds is None:
        return {c: np.empty(0, dtype=object) for c in columns}
    tbl = _collect_table(ds.select_columns(columns))
    return {c: np.asarray(tbl[c].to_pylist(), dtype=object) for c in columns}


def _parent_closure(rel_edges_child: np.ndarray, rel_edges_parent: np.ndarray,
                    seed: np.ndarray, skip: np.ndarray | None = None) -> np.ndarray:
    """Recursive member->parent closure over relation->relation edges
    (strategy_complete_ways.cpp:36-43): returns seed ∪ all ancestors."""
    have = set(seed.tolist())
    if skip is not None:
        blocked = set(skip.tolist())
    else:
        blocked = set()
    frontier = set(seed.tolist())
    while frontier:
        hit = _isin(rel_edges_child, np.asarray(list(frontier), dtype=object))
        parents = set(rel_edges_parent[hit].tolist()) - have - blocked
        have |= parents
        frontier = parents
    return np.asarray(sorted(have), dtype=object)


def run_extract(images, regions: list[Region], groups=None, members=None,
                strategy: str = "complete_ways", options: dict | None = None,
                level: int = 8, concurrency=None):
    """Run an extract strategy. Returns dict with:
       images_out: Dataset of matched image rows + extract_id (fan-out)
       group_rows: pa.Table (group_id, kind, extract_id)
       sets: ExtractSets (the id sets, for tests/inspection)
    """
    options = options or {}
    E = len(regions)
    sets = ExtractSets(E)
    sets.node_ids = _matched_node_ids(images, regions, level, concurrency)

    do_relations = not (strategy == "complete_ways"
                        and str(options.get("relations", "")).lower() == "false")

    g = _collect_small(groups, ["group_id", "kind"]) if groups is not None else None
    kind_of = dict(zip(g["group_id"], g["kind"])) if g else {}

    mem = None
    if members is not None:
        # only relation-owned member rows are needed driver-side (simple's
        # first-member rule, smart's member lists, the rel->rel edges);
        # way members — the big side — stay distributed
        rel_ids_all = np.unique(g["group_id"][g["kind"] == "relation"]) \
            if g else np.empty(0, dtype=object)
        if len(rel_ids_all):
            import ray as _ray
            rref = _ray.put(rel_ids_all)

            def owner_is_rel(batch: pa.Table) -> pa.Table:
                rel_set = _ray.get(rref)
                return batch.filter(pa.array(_isin(_np_str(batch["group_id"]),
                                                   rel_set)))

            rel_members = members.map_batches(owner_is_rel, batch_format="pyarrow")
            mem = _collect_small(rel_members, ["group_id", "seq", "mtype", "ref"])
        else:
            mem = _collect_small(None, ["group_id", "seq", "mtype", "ref"])

    if groups is not None and members is not None:
        # registry dispatch (SURVEY §2.9): built-ins register below; user
        # packages add strategies via @register_strategy without engine
        # edits — the reference's ExtractStrategy plug-in surface
        # (src/extract/strategy.hpp:71-86)
        get_strategy(strategy)(sets, groups, members, mem, kind_of,
                               options, do_relations)

    # final image selection: node_ids ∪ extra_node_ids, emitted with extract_id
    import ray

    final_nodes = [np.unique(np.concatenate([sets.node_ids[e], sets.extra_node_ids[e]]))
                   for e in range(E)]
    fref = ray.put(final_nodes)

    def select_images(batch: pa.Table) -> pa.Table:
        idsets = ray.get(fref)
        ids = _np_str(batch["image_id"])
        parts = []
        for e, s in enumerate(idsets):
            m = _isin(ids, s)
            if m.any():
                part = batch.filter(pa.array(m))
                parts.append(part.append_column(
                    "extract_id", pa.array(np.full(part.num_rows, e, dtype=np.int32))))
        if not parts:
            empty = batch.slice(0, 0)
            return empty.append_column("extract_id", pa.array([], type=pa.int32()))
        return pa.concat_tables(parts)

    images_out = images.map_batches(select_images, batch_format="pyarrow")

    group_rows = []
    for e in range(E):
        ways = np.unique(np.concatenate([sets.way_ids[e], sets.extra_way_ids[e]]))
        for gid in ways:
            group_rows.append((gid, "way", e))
        for gid in sets.relation_ids[e]:
            group_rows.append((gid, "relation", e))
    group_tbl = pa.table({
        "group_id": pa.array([r[0] for r in group_rows], type=pa.string()),
        "kind": pa.array([r[1] for r in group_rows], type=pa.string()),
        "extract_id": pa.array([r[2] for r in group_rows], type=pa.int32()),
    })
    return {"images_out": images_out, "group_rows": group_tbl, "sets": sets}


def run_extract_cw_dataset(images, regions: list[Region], groups, members,
                           level: int = 8, concurrency=None,
                           num_partitions: int | None = None,
                           do_relations: bool = True,
                           assume_unique_ids: bool = True):
    """complete_ways with the IMAGE-scale id sets kept as DATASETS — the
    10^12-row scale path the broadcast form (run_extract) cannot reach:
    no matched-IMAGE-id array ever lands on the driver; the node->way join
    and the final selection are hash-partitioned Dataset.joins over narrow
    (id, extract_id) projections. The driver touches only GROUP metadata
    (way/relation ids + kinds — bounded by #groups, which the reference
    also holds in RAM, and which this function must collect anyway to emit
    group_rows) and block refs. Group-id sets therefore travel by
    broadcast (`ray.put` once, searchsorted in every task), not by join —
    two fewer aggregator-actor spin-ups per extract.

    Same semantics as strategy_complete_ways.cpp: nodes inside -> ways
    with >=1 recorded node -> ALL their node refs; relations with any
    recorded node/way member, closed over rel->rel parent edges.

    assume_unique_ids: the fanout matcher emits each input row at most
    once per region, so with unique image_ids the (image_id, extract_id)
    pairs are distinct by construction and the first shuffle is skipped.
    Pass False for versioned/duplicated inputs.

    Returns the same dict shape as run_extract (images_out, group_rows),
    without the `sets` driver arrays (that is the point)."""
    import ray

    E = len(regions)
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)

    import os as _os
    import sys as _sys
    import time as _time
    _prof = _os.environ.get("OSMRAY_PROF") == "1"
    _tprev = [_time.monotonic()]

    def _tick(label: str) -> None:
        # stage walls to stderr under OSMRAY_PROF=1 (scaling forensics)
        if _prof:
            now = _time.monotonic()
            print(f"[cw_dataset] {label}: {now - _tprev[0]:.2f}s",
                  file=_sys.stderr)
            _tprev[0] = now

    def _mat(ds, id_name="image_id"):
        """Materialize between joins (each Dataset.join pins
        num_partitions aggregator actors for the DAG's lifetime, and a
        chain of joins in one DAG can outsize the CPU count — see
        stages/dedup._attach_pair_payload) AND drop the zero-column empty
        blocks Ray's groupby chains emit, which would otherwise reach a
        downstream join as schema-less partitions. Only block refs and
        row counts touch the driver; the id tables stay sharded."""
        from ..blocks import _drop_empty_blocks

        out = _drop_empty_blocks(ds)
        if out is None:
            import ray.data as rd
            return rd.from_arrow(pa.schema(
                [(id_name, pa.string()), ("extract_id", pa.int32())])
                .empty_table())
        return out

    # pass 1 — distributed spatial match: (image_id, extract_id)
    from ..stages.extract import region_match_batches

    regions_ref = ray.put(regions)
    matched = region_match_batches(
        images.select_columns(["image_id", "lon", "lat"]), regions_ref,
        level).select_columns(["image_id", "extract_id"])
    if not assume_unique_ids:
        from ..blocks import hash_distinct
        matched = hash_distinct(matched, ["image_id", "extract_id"])
    node_ids = _mat(matched)
    _tick("match+mat")

    # narrow node-member projection, materialized: Ray 2.49's join builds
    # schema-less (crashing) empty partitions when an input's schema is
    # not known up front; materializing pins the schema
    import pyarrow.compute as _pc

    def _node_proj(b: pa.Table) -> pa.Table:
        sel = b.filter(_pc.equal(b["mtype"], "node"))
        return pa.table({"group_id": sel["group_id"], "ref": sel["ref"]})

    node_members = members.map_batches(_node_proj,
                                       batch_format="pyarrow").materialize()
    _tick("node_members mat")

    # group hits: node members whose ref is a recorded node. The join
    # output is image-scale, but its DISTINCT (group_id, extract_id)
    # projection is group-metadata-class — partial-distinct map-side,
    # merge the tiny per-block partials driver-side (no groupby shuffle).
    # A fully-empty join side crashes Ray 2.49's aggregator (schema-less
    # empty partitions) and means an empty join anyway — short-circuit.
    empty_hits = pa.schema([("group_id", pa.string()),
                            ("extract_id", pa.int32())]).empty_table()
    if node_ids.count() == 0 or node_members.count() == 0:
        hits = empty_hits
    else:
        wj = node_members.join(node_ids, join_type="inner",
                               num_partitions=num_partitions,
                               on=("ref",), right_on=("image_id",))

        def _pair_partial(b: pa.Table) -> pa.Table:
            t = pa.table({"group_id": b["group_id"],
                          "extract_id": b["extract_id"]})
            return t.group_by(["group_id", "extract_id"]).aggregate([])

        hits = _collect_table(wj.map_batches(_pair_partial,
                                             batch_format="pyarrow")) \
            .group_by(["group_id", "extract_id"]).aggregate([])
    _tick("join1+hits")
    hit_gids = _np_str(hits["group_id"])
    hit_eids = hits["extract_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    # owner kinds (group metadata — broadcast, as the reference does in RAM)
    g = _collect_small(groups, ["group_id", "kind"])
    kind_of = dict(zip(g["group_id"], g["kind"]))
    hit_kinds = np.asarray([kind_of.get(x) for x in hit_gids], dtype=object)
    way_mask = hit_kinds == "way"
    way_sets = [np.unique(hit_gids[way_mask & (hit_eids == e)])
                for e in range(E)]
    wref = ray.put(way_sets)

    # extra node refs: ALL node refs of recorded ways — broadcast
    # way-id-set filter (group-metadata-class set; no join/shuffle).
    # The OUTPUT is image-scale and stays a Dataset.
    def _extra_refs(b: pa.Table) -> pa.Table:
        wsets = ray.get(wref)
        gid = _np_str(b["group_id"])
        parts = []
        for e, s in enumerate(wsets):
            m = _isin(gid, s)
            if m.any():
                sel = b.filter(pa.array(m))
                parts.append(pa.table({
                    "image_id": sel["ref"],
                    "extract_id": pa.array(
                        np.full(sel.num_rows, e, dtype=np.int32))}))
        if not parts:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "extract_id": pa.array([], type=pa.int32())})
        return pa.concat_tables(parts)

    extra = node_members.map_batches(_extra_refs, batch_format="pyarrow")

    # final node ids: inside ∪ referenced — the one genuinely-needed
    # image-scale shuffle (a node can be both inside and referenced).
    # hash_distinct shuffles an int32 bucket id instead of the raw string
    # keys (native Aggregate sort-shuffles the strings: ~10x the wall at
    # 10M rows)
    from ..blocks import hash_distinct
    final_ids = _mat(hash_distinct(node_ids.union(extra),
                                   ["image_id", "extract_id"]))
    _tick("extra+union+distinct")

    # id set (schema-known) on the LEFT — see node_members note; empty
    # side short-circuited (same Ray 2.49 empty-join crash as above)
    if final_ids.count() == 0:
        import ray.data as _rd
        ischema = images.schema()
        images_out = _rd.from_arrow(
            pa.schema([("image_id", pa.string()), ("extract_id", pa.int32())]
                      + [(n, t) for n, t in zip(ischema.names, ischema.types)
                         if n != "image_id"]).empty_table())
    else:
        images_out = final_ids.join(images, join_type="inner",
                                    num_partitions=num_partitions,
                                    on=("image_id",))

    # relations (id lists are metadata-class; parent closure driver-side
    # over the rel->rel edge list, like run_extract)
    rel_rows = []
    if do_relations:
        rel_mask = hit_kinds == "relation"
        rel_gids, rel_eids = hit_gids[rel_mask], hit_eids[rel_mask]

        # relations owning a recorded way: broadcast way-set membership
        # over way-type members, partial-distinct map-side
        kref = ray.put(kind_of)

        def _rel_by_way(b: pa.Table) -> pa.Table:
            wsets = ray.get(wref)
            kmap = ray.get(kref)
            sel = b.filter(_pc.equal(b["mtype"], "way"))
            gid = _np_str(sel["group_id"])
            ref = _np_str(sel["ref"])
            out_g, out_e = [], []
            for e, s in enumerate(wsets):
                hit = _isin(ref, s)
                if hit.any():
                    p = np.unique(gid[hit])
                    p = p[np.asarray([kmap.get(x) == "relation" for x in p],
                                     dtype=bool)]
                    if len(p):
                        out_g.append(p)
                        out_e.append(np.full(len(p), e, dtype=np.int32))
            if not out_g:
                return pa.table({"group_id": pa.array([], type=pa.string()),
                                 "extract_id": pa.array([], type=pa.int32())})
            return pa.table({
                "group_id": pa.array(np.concatenate(out_g), type=pa.string()),
                "extract_id": pa.array(np.concatenate(out_e))})

        rbw = _collect_table(members.map_batches(_rel_by_way,
                                                 batch_format="pyarrow"))
        rel_gids = np.concatenate([rel_gids, _np_str(rbw["group_id"])])
        rel_eids = np.concatenate([
            rel_eids,
            rbw["extract_id"].to_numpy(zero_copy_only=False).astype(np.int64)])
        # rel->rel edges from relation-owned relation members (tiny)
        rel_all = np.unique(g["group_id"][g["kind"] == "relation"])
        edges = _collect_table(members.map_batches(
            lambda b: b.filter(_pc.equal(b["mtype"], "relation"))
            .select(["group_id", "ref"]), batch_format="pyarrow"))
        echild = _np_str(edges["ref"])
        eparent = _np_str(edges["group_id"])
        owner_rel = _isin(eparent, rel_all)
        echild, eparent = echild[owner_rel], eparent[owner_rel]
        for e in range(E):
            seed = np.unique(rel_gids[rel_eids == e])
            closed = _parent_closure(echild, eparent, seed)
            for gid in closed:
                rel_rows.append((gid, "relation", e))

    group_rows = [(gid, "way", int(e))
                  for gid, e in zip(hit_gids[way_mask], hit_eids[way_mask])] \
        + rel_rows
    group_tbl = pa.table({
        "group_id": pa.array([r[0] for r in group_rows], type=pa.string()),
        "kind": pa.array([r[1] for r in group_rows], type=pa.string()),
        "extract_id": pa.array([int(r[2]) for r in group_rows], type=pa.int32()),
    })
    _tick("relations+final-join-build")
    return {"images_out": images_out, "group_rows": group_tbl}


def _rel_edges(mem, kind_of):
    """relation->relation edges (parent=group_id, child=ref)."""
    is_rel_member = mem["mtype"] == "relation"
    owner_is_rel = np.asarray([kind_of.get(x) == "relation" for x in mem["group_id"]],
                              dtype=bool)
    m = is_rel_member & owner_is_rel
    return mem["ref"][m], mem["group_id"][m]


@register_strategy("simple")
def _strategy_simple(sets, groups_ds, members_ds, mem, kind_of, options,
                     do_relations):
    _run_simple(sets, members_ds, mem, kind_of, do_relations)


@register_strategy("complete_ways")
@register_strategy("complete_ways_with_history")
def _strategy_complete_ways(sets, groups_ds, members_ds, mem, kind_of,
                            options, do_relations):
    # complete_ways_with_history
    # (strategy_complete_ways_with_history.cpp): identical id-set
    # construction, but run over a versioned object stream — a row
    # of ANY version inside the region marks its id, and the final
    # id-based selection emits ALL versions of marked objects
    # (the reference forbids history input to plain complete_ways;
    # here the id sets are version-agnostic by construction).
    _run_complete_ways(sets, members_ds, mem, kind_of, do_relations)


@register_strategy("smart")
def _strategy_smart(sets, groups_ds, members_ds, mem, kind_of, options,
                    do_relations):
    _run_smart(sets, groups_ds, members_ds, mem, kind_of, options)


def _run_simple(sets, members_ds, mem, kind_of, do_relations):
    E = sets.n_extracts
    sets.way_ids = _member_hits(members_ds, sets.node_ids, "node", kind_of, "way")
    if not do_relations:
        return
    # relation fate decided by its first node/way-type member (strategy_simple.cpp:89-106)
    owner_rel = np.asarray([kind_of.get(x) == "relation" for x in mem["group_id"]],
                           dtype=bool)
    nonrel = mem["mtype"] != "relation"
    cand = owner_rel & nonrel
    order = np.lexsort((mem["seq"][cand].astype(np.int64),
                        mem["group_id"][cand].astype(str)))
    gids = mem["group_id"][cand][order]
    mts = mem["mtype"][cand][order]
    refs = mem["ref"][cand][order]
    first = np.ones(len(gids), dtype=bool)
    first[1:] = gids[1:] != gids[:-1]
    f_gid, f_mt, f_ref = gids[first], mts[first], refs[first]
    for e in range(E):
        ok = ((f_mt == "node") & _isin(f_ref, sets.node_ids[e])) | \
             ((f_mt == "way") & _isin(f_ref, sets.way_ids[e]))
        sets.relation_ids[e] = np.unique(f_gid[ok])


def _run_complete_ways(sets, members_ds, mem, kind_of, do_relations):
    """Two fused member scans instead of four: pass A gets node->way and
    node->relation hits together; pass B gets way->node refs and
    way->relation parent hits together (strategy_complete_ways.cpp runs
    one streaming pass per concern; fusing halves the dominant distributed
    scans at no semantic cost)."""
    E = sets.n_extracts
    hits = _member_hits_by_kind(members_ds, sets.node_ids, "node", kind_of)
    sets.way_ids = hits["way"]
    sets.extra_node_ids, rel_by_way = _refs_and_parent_hits(
        members_ds, sets.way_ids, kind_of)
    if not do_relations:
        return
    rel_by_node = hits["relation"]
    child, parent = _rel_edges(mem, kind_of)
    for e in range(E):
        seed = np.union1d(rel_by_node[e], rel_by_way[e])
        sets.relation_ids[e] = _parent_closure(child, parent, seed)


def _smart_check_type(tags: list, types: list[str]) -> bool:
    if not types:
        return True
    tv = {t["key"]: t["value"] for t in (tags or [])}
    return tv.get("type") in types


def _smart_check_tags(tags: list, filter_tags: list[str]) -> bool:
    tags = tags or []
    if not filter_tags:
        return len(tags) > 0  # default TagsFilter{true}: any tag matches
    for t in tags:
        for ft in filter_tags:
            if "=" in ft:
                k, v = ft.split("=", 1)
                if t["key"] == k and t["value"] == v:
                    return True
            elif t["key"] == ft:
                return True
    return False


def _run_smart(sets, groups_ds, members_ds, mem, kind_of, options):
    E = sets.n_extracts
    sets.way_ids = _member_hits(members_ds, sets.node_ids, "node", kind_of, "way")

    types = ["multipolygon"]
    tval = options.get("types")
    if tval is not None:
        types = [] if tval in ("", "any", "true", True) else str(tval).split(",")
    pct = int(options.get("complete-partial-relations", 100) or 100)
    if pct <= 0 or pct > 100:
        pct = 100
    filter_tags = [t for t in str(options.get("tags", "")).split(",") if t]

    gt = _collect_small(groups_ds, ["group_id", "tags"])
    tags_of = dict(zip(gt["group_id"], gt["tags"]))

    # per-relation member lists (driver-side on collected adjacency; the
    # wanted-member counting is a grouped aggregate — SURVEY.md §7.4)
    owner_rel = np.asarray([kind_of.get(x) == "relation" for x in mem["group_id"]],
                           dtype=bool)
    rel_gid = mem["group_id"][owner_rel]
    rel_mt = mem["mtype"][owner_rel]
    rel_ref = mem["ref"][owner_rel]
    all_sizes: dict[str, int] = {}
    for gid in rel_gid:
        all_sizes[gid] = all_sizes.get(gid, 0) + 1

    for e in range(E):
        node_hit = (rel_mt == "node") & _isin(rel_ref, sets.node_ids[e])
        way_hit = (rel_mt == "way") & _isin(rel_ref, sets.way_ids[e])
        hit = node_hit | way_hit
        wanted: dict[str, int] = {}
        for gid in rel_gid[hit]:
            wanted[gid] = wanted.get(gid, 0) + 1
        rel_ids = np.unique(rel_gid[hit])
        sets.relation_ids[e] = rel_ids
        add_members = []
        for gid, n_sz in all_sizes.items():
            w = wanted.get(gid, 0)
            tags = tags_of.get(gid)
            if w > 0 and _smart_check_type(tags, types) and _smart_check_tags(tags, filter_tags):
                add_members.append(gid)
            elif w * 100 >= n_sz * pct and _smart_check_tags(tags, filter_tags):
                add_members.append(gid)  # complete-partial-relations (smart:235-237)
        if add_members:
            am = np.asarray(add_members, dtype=object)
            sel = _isin(rel_gid, am)
            sets.extra_node_ids[e] = np.unique(rel_ref[sel & (rel_mt == "node")])
            sets.extra_way_ids[e] = np.unique(rel_ref[sel & (rel_mt == "way")])

    # parent closure (skips extra_relation_ids, never set here — smart.cpp:56-63)
    child, parent = _rel_edges(mem, kind_of)
    for e in range(E):
        sets.relation_ids[e] = _parent_closure(child, parent, sets.relation_ids[e])

    # pass 2: node refs of way_ids | extra_way_ids -> extra_node_ids (smart:257-265)
    all_ways = [np.union1d(sets.way_ids[e], sets.extra_way_ids[e]) for e in range(E)]
    way_nodes = _member_refs_of(members_ds, all_ways, ("node",))
    for e in range(E):
        sets.extra_node_ids[e] = np.union1d(sets.extra_node_ids[e], way_nodes[e])
