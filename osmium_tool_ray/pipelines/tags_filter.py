"""tags-filter — distributed port of /root/reference/src/command_tags_filter.cpp.

Match semantics (:203-230):
  * node: any tag matches a node-bank matcher
  * way: way-bank match, OR (closed ring: first ref == last ref AND >=4
    member refs) and any area-bank ("a/...") matcher matches
  * relation: relation-bank match, OR type in {multipolygon, boundary} and
    any area-bank matcher matches
  * `-i` inverts the match at every decision point (matches != invert).

Reference closure, on by default, disabled by `-R` (:368-396):
  pass 1 find_relations_in_relations (:255-288): matching relations ->
    matching_rel_ids; their node/way members referenced; recursive DESCENT
    into member relations of matching relations (mark_rel_ids :247-253).
  pass 2 find_nodes_and_ways_in_relations (:290-309): members of referenced
    relations -> referenced node/way ids.
  pass 3 find_nodes_in_ways (:311-327): matching ways -> matching_way_ids +
    their nodes referenced; referenced ways -> nodes referenced too.
  final copy (:346-366): write matching ∪ referenced; referenced-only rows
    optionally tag-stripped (`-t`); nodes decide their own match inline.

Ray Data restatement: the per-row predicates run vectorized inside
map_batches over the images (nodes) and groups datasets; the closure is a
bounded driver loop of broadcast semi-joins over the members dataset
(SURVEY.md §3.2) — the reference's own structure, scans replaced by joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.matchers import TagsFilter, get_filter_expression, get_tag_matcher
from .extract import _collect_small, _collect_table, _isin, _member_refs_of, _np_str


def _closed_way_flags(members, way_ids: np.ndarray) -> np.ndarray:
    """Distributed closed-ring test per way: >=4 member refs AND first ref
    (min seq) == last ref (max seq) — command_tags_filter.cpp:212-217.

    One vectorized pass over the members dataset emits per-(way, batch)
    partials (min/max seq + their refs + count); partials merge driver-side
    (one narrow row per way per batch — metadata-class, the ways table is
    already driver-resident). Returns a bool mask aligned with way_ids."""

    def partial(batch: pa.Table) -> pa.Table:
        gid = _np_str(batch["group_id"])
        seq = batch["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        ref = _np_str(batch["ref"])
        order = np.lexsort((seq, gid.astype(str)))
        g, s, r = gid[order], seq[order], ref[order]
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            first[1:] = g[1:] != g[:-1]
        fi = np.nonzero(first)[0]
        li = np.append(fi[1:], len(g)) - 1
        return pa.table({
            "gid": pa.array(g[fi], type=pa.string()),
            "min_seq": pa.array(s[fi]), "first_ref": pa.array(r[fi], type=pa.string()),
            "max_seq": pa.array(s[li]), "last_ref": pa.array(r[li], type=pa.string()),
            "n": pa.array(li - fi + 1),
        })

    t = _collect_table(members.map_batches(partial, batch_format="pyarrow"))
    if t.num_rows == 0 or len(way_ids) == 0:
        return np.zeros(len(way_ids), dtype=bool)
    g = _np_str(t["gid"]).astype(str)
    mins = t["min_seq"].to_numpy(zero_copy_only=False)
    maxs = t["max_seq"].to_numpy(zero_copy_only=False)
    fr = _np_str(t["first_ref"])
    lr = _np_str(t["last_ref"])
    cnt = t["n"].to_numpy(zero_copy_only=False)
    o1 = np.lexsort((mins, g))
    first = np.ones(len(g), dtype=bool)
    g1 = g[o1]
    if len(g) > 1:
        first[1:] = g1[1:] != g1[:-1]
    starts = np.nonzero(first)[0]
    keys = g1[starts]                       # sorted distinct way ids
    f = fr[o1][starts]                      # ref at global min seq per way
    o2 = np.lexsort((maxs, g))
    ends = np.append(starts[1:], len(g)) - 1
    l = lr[o2][ends]                        # ref at global max seq per way
    total = np.add.reduceat(cnt[o1], starts)
    closed = (total >= 4) & (f == l)
    w = np.asarray(way_ids).astype(str)
    pos = np.searchsorted(keys, w)
    pos_c = np.minimum(pos, len(keys) - 1)
    return (keys[pos_c] == w) & closed[pos_c]


class TagsFilterBanks:
    """Per-entity matcher banks incl. the area bank (command_tags_filter.cpp:46-59)."""

    def __init__(self, expressions: list[str]):
        self.banks = {"node": [], "way": [], "relation": [], "area": []}
        for expr in expressions:
            expr = expr.strip()
            if not expr or expr.startswith("#"):
                continue
            types, tag_expr = get_filter_expression(expr)
            m = get_tag_matcher(tag_expr)
            for t in types:
                if t in self.banks:
                    self.banks[t].append(m)

    def _match(self, tags_col, bank: str) -> np.ndarray:
        tf = TagsFilter([(frozenset({"x"}), m) for m in self.banks[bank]])
        return tf.match_tag_lists(tags_col, "x") if self.banks[bank] else \
            np.zeros(len(tags_col), dtype=bool)

    def match_nodes(self, tags_col) -> np.ndarray:
        return self._match(tags_col, "node")

    def match_ways(self, tags_col, closed: np.ndarray) -> np.ndarray:
        m = self._match(tags_col, "way")
        if self.banks["area"]:
            m |= closed & self._match(tags_col, "area")
        return m

    def match_relations(self, tags_col, is_mp: np.ndarray) -> np.ndarray:
        m = self._match(tags_col, "relation")
        if self.banks["area"]:
            m |= is_mp & self._match(tags_col, "area")
        return m


def _tags_array(tags_list) -> pa.Array:
    from ..schema import TAGS_TYPE
    return pa.array([t if t is not None else [] for t in tags_list], type=TAGS_TYPE)


def _is_multipolygon(tags_list) -> np.ndarray:
    out = np.zeros(len(tags_list), dtype=bool)
    for i, tags in enumerate(tags_list):
        for t in tags or []:
            if t["key"] == "type":
                out[i] = t["value"] in ("multipolygon", "boundary")
                break
    return out


def run_tags_filter(images, expressions: list[str], groups=None, members=None,
                    invert: bool = False, add_referenced: bool = True,
                    remove_tags: bool = False, tags_col: str = "tags",
                    concurrency=None):
    """Returns {"images_out": Dataset (+`referenced_only` bool col),
    "group_rows": pa.Table (group_id, kind, referenced_only)}."""
    import ray

    banks = TagsFilterBanks(expressions)

    g = _collect_small(groups, ["group_id", "kind", "tags"]) if groups is not None else None
    # only relation-owned member rows come to the driver (the rel->rel
    # descent and relation member lists); way members — the big side —
    # stay distributed (same shape as extract.py, commit c13d61c)
    mem = None
    if members is not None and g is not None:
        rel_ids_all0 = np.unique(g["group_id"][g["kind"] == "relation"])
        if len(rel_ids_all0):
            rref = ray.put(rel_ids_all0)

            def owner_is_rel(batch: pa.Table) -> pa.Table:
                rel_set = ray.get(rref)
                return batch.filter(pa.array(_isin(_np_str(batch["group_id"]),
                                                   rel_set)))

            mem = _collect_small(members.map_batches(owner_is_rel,
                                                     batch_format="pyarrow"),
                                 ["group_id", "seq", "mtype", "ref"])
        else:
            mem = {c: np.empty(0, dtype=object)
                   for c in ("group_id", "seq", "mtype", "ref")}

    matching_ways = np.empty(0, dtype=object)
    matching_rels = np.empty(0, dtype=object)
    referenced = {"node": np.empty(0, dtype=object), "way": np.empty(0, dtype=object),
                  "relation": np.empty(0, dtype=object)}

    if g is not None and mem is not None and len(g["group_id"]):
        is_way = g["kind"] == "way"
        is_rel = g["kind"] == "relation"
        way_ids_all = g["group_id"][is_way]
        # closed-ring test per way (distributed pass over members; only
        # needed when an area-bank matcher can consult it)
        closed = _closed_way_flags(members, way_ids_all) \
            if banks.banks["area"] and len(way_ids_all) \
            else np.zeros(len(way_ids_all), dtype=bool)
        way_tags = _tags_array(list(g["tags"][is_way]))
        rel_tags = _tags_array(list(g["tags"][is_rel]))
        rel_ids_all = g["group_id"][is_rel]
        way_match = banks.match_ways(way_tags, closed) != invert
        rel_match = banks.match_relations(rel_tags, _is_multipolygon(list(g["tags"][is_rel]))) != invert

        if add_referenced:
            # pass 1: relations (find_relations_in_relations)
            todo = bool(banks.banks["relation"] or banks.banks["area"] or invert)
            any_rel_members = (mem["mtype"] == "relation").any() or len(rel_ids_all) > 0
            if todo and len(rel_ids_all):
                matching_rels = rel_ids_all[rel_match]
                msel = _isin(mem["group_id"], matching_rels)
                referenced["node"] = np.unique(mem["ref"][msel & (mem["mtype"] == "node")])
                referenced["way"] = np.unique(mem["ref"][msel & (mem["mtype"] == "way")])
                # recursive descent into member relations (mark_rel_ids)
                frontier = set(matching_rels.tolist())
                seen: set = set()
                while frontier:
                    fsel = _isin(mem["group_id"], np.asarray(list(frontier), dtype=object)) \
                        & (mem["mtype"] == "relation")
                    children = set(mem["ref"][fsel].tolist()) - seen
                    seen |= children
                    frontier = children
                referenced["relation"] = np.asarray(sorted(seen), dtype=object)
                # pass 2: members of referenced relations
                rsel = _isin(mem["group_id"], referenced["relation"])
                referenced["node"] = np.union1d(
                    referenced["node"], mem["ref"][rsel & (mem["mtype"] == "node")])
                referenced["way"] = np.union1d(
                    referenced["way"], mem["ref"][rsel & (mem["mtype"] == "way")])
            # pass 3: nodes in matching or referenced ways — run iff there are
            # way/area filters or referenced ways (find_referenced_objects
            # :337-339; note invert does NOT force this pass, unlike pass 1)
            if banks.banks["way"] or banks.banks["area"] or len(referenced["way"]):
                matching_ways = way_ids_all[way_match]
                take = np.union1d(matching_ways, referenced["way"])
                # way->node refs gathered distributed (way members never
                # reach the driver)
                way_nodes = _member_refs_of(members, [take], ("node",))[0]
                referenced["node"] = np.union1d(referenced["node"], way_nodes)
        else:
            matching_ways = way_ids_all[way_match]
            matching_rels = rel_ids_all[rel_match]

        if not add_referenced:
            referenced = {k: np.empty(0, dtype=object) for k in referenced}

    # final image (node) selection — distributed single pass
    banks_ref = ray.put(banks)
    ref_nodes = ray.put(referenced["node"])
    inv = invert
    rm = remove_tags

    def select_images(batch: pa.Table) -> pa.Table:
        b = ray.get(banks_ref)
        refset = ray.get(ref_nodes)
        tags = batch[tags_col]
        match = b.match_nodes(tags) != inv
        ids = _np_str(batch["image_id"])
        is_ref = _isin(ids, refset)
        keep = match | is_ref
        ref_only = is_ref & ~match
        out = batch.filter(pa.array(keep))
        ref_only_kept = ref_only[keep]
        if rm and ref_only_kept.any():
            from ..schema import TAGS_TYPE
            cleared = []
            col = out[tags_col].to_pylist()
            for i, r in enumerate(ref_only_kept):
                cleared.append([] if r else col[i])
            out = out.set_column(out.schema.get_field_index(tags_col), tags_col,
                                 pa.array(cleared, type=TAGS_TYPE))
        return out.append_column("referenced_only", pa.array(ref_only_kept))

    images_out = images.map_batches(select_images, batch_format="pyarrow")

    rows = []
    if g is not None:
        tags_of = dict(zip(g["group_id"], g["tags"]))
        for kind, match_set in (("way", matching_ways), ("relation", matching_rels)):
            for gid in match_set:
                rows.append((gid, kind, False))
        for kind in ("way", "relation"):
            for gid in referenced[kind]:
                if kind == "way" and gid in set(matching_ways.tolist()):
                    continue
                if kind == "relation" and gid in set(matching_rels.tolist()):
                    continue
                rows.append((gid, kind, True))
    else:
        tags_of = {}
    from ..schema import TAGS_TYPE
    # referenced-only groups are tag-stripped under -t, like nodes (:360-366)
    out_tags = [[] if (r[2] and remove_tags) else list(tags_of.get(r[0]) or [])
                for r in rows]
    group_rows = pa.table({
        "group_id": pa.array([r[0] for r in rows], type=pa.string()),
        "kind": pa.array([r[1] for r in rows], type=pa.string()),
        "referenced_only": pa.array([r[2] for r in rows], type=pa.bool_()),
        "tags": pa.array(out_tags, type=TAGS_TYPE),
    })
    return {"images_out": images_out, "group_rows": group_rows}
