"""T2 fixture: replica of /root/reference/test/tags-filter/input.osm and
input-site.osm with goldens from test/tags-filter/CMakeLists.txt cases."""

import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.tags_filter import run_tags_filter
from osmium_tool_ray.schema import TAGS_TYPE


def _mk(ray, nodes, groups, members):
    import ray.data as rd

    images = rd.from_arrow(pa.table({
        "image_id": pa.array([n[0] for n in nodes]),
        "lon": pa.array([1.0] * len(nodes)),
        "lat": pa.array([float(i + 1) for i in range(len(nodes))]),
        "tags": pa.array([n[1] for n in nodes], type=TAGS_TYPE),
    }))
    groups_ds = rd.from_arrow(pa.table({
        "group_id": pa.array([g[0] for g in groups]),
        "kind": pa.array([g[1] for g in groups]),
        "tags": pa.array([g[2] for g in groups], type=TAGS_TYPE),
    }))
    members_ds = rd.from_arrow(pa.table({
        "group_id": pa.array([m[0] for m in members]),
        "seq": pa.array([m[1] for m in members], type=pa.int32()),
        "mtype": pa.array([m[2] for m in members]),
        "ref": pa.array([m[3] for m in members]),
    }))
    return images, groups_ds, members_ds


def _t(k, v):
    return {"key": k, "value": v}


@pytest.fixture(scope="module")
def base(ray_session):
    nodes = [("n10", []), ("n11", [_t("barrier", "gate")]), ("n12", []), ("n13", []),
             ("n14", [_t("amenity", "post_box")]), ("n15", [_t("highway", "traffic_signals")])]
    groups = [("w20", "way", [_t("highway", "primary")]),
              ("w21", "way", [_t("highway", "residential"), _t("note", "test")]),
              ("r30", "relation", [_t("note", "test")])]
    members = [("w20", 0, "node", "n10"), ("w20", 1, "node", "n11"), ("w20", 2, "node", "n12"),
               ("w21", 0, "node", "n12"), ("w21", 1, "node", "n13"),
               ("r30", 0, "node", "n12"), ("r30", 1, "way", "w20")]
    return _mk(ray_session, nodes, groups, members)


@pytest.fixture(scope="module")
def site(ray_session):
    nodes = [("n10", []), ("n11", [_t("barrier", "gate")]), ("n12", []), ("n13", [])]
    groups = [("w20", "way", [_t("highway", "primary")]),
              ("w21", "way", [_t("highway", "primary")]),
              ("r30", "relation", [_t("note", "test")]),
              ("r31", "relation", [_t("site", "1")]),
              ("r32", "relation", [_t("site", "2")])]
    members = [("w20", 0, "node", "n10"), ("w20", 1, "node", "n11"), ("w20", 2, "node", "n12"),
               ("w21", 0, "node", "n13"),
               ("r30", 0, "node", "n12"), ("r30", 1, "way", "w20"),
               ("r31", 0, "relation", "r30"),
               ("r32", 0, "relation", "r31")]
    return _mk(ray_session, nodes, groups, members)


def _run(ds3, exprs, **kw):
    images, groups, members = ds3
    res = run_tags_filter(images, exprs, groups=groups, members=members, **kw)
    rows = res["images_out"].take_all()
    nodes = sorted(r["image_id"] for r in rows)
    tags_by_node = {r["image_id"]: r["tags"] for r in rows}
    gr = res["group_rows"]
    ways = sorted(gr.filter(pa.compute.equal(gr["kind"], "way"))["group_id"].to_pylist())
    rels = sorted(gr.filter(pa.compute.equal(gr["kind"], "relation"))["group_id"].to_pylist())
    return nodes, ways, rels, tags_by_node


def test_node_amenity(base):
    # output-amenity.osm — with or without -R the result is identical
    for add_ref in (True, False):
        nodes, ways, rels, _ = _run(base, ["n/amenity"], add_referenced=add_ref)
        assert (nodes, ways, rels) == (["n14"], [], [])


def test_highway_closure(base):
    # output-highway.osm: nodes of matching ways pulled in
    nodes, ways, rels, _ = _run(base, ["w/highway"])
    assert nodes == ["n10", "n11", "n12", "n13"]
    assert ways == ["w20", "w21"]
    assert rels == []


def test_highway_R(base):
    # output-highway-R.osm: no referenced objects
    nodes, ways, rels, _ = _run(base, ["w/highway"], add_referenced=False)
    assert (nodes, ways, rels) == ([], ["w20", "w21"], [])


def test_highway_inverted(base):
    # output-highway-i.osm: all nodes; w20 via inverted-matching r30; r30
    nodes, ways, rels, _ = _run(base, ["w/highway"], invert=True)
    assert nodes == ["n10", "n11", "n12", "n13", "n14", "n15"]
    assert ways == ["w20"]
    assert rels == ["r30"]


def test_note_R(base):
    # output-note-R.osm: untyped expression hits all banks
    nodes, ways, rels, _ = _run(base, ["note"], add_referenced=False)
    assert (nodes, ways, rels) == ([], ["w21"], ["r30"])


def test_note_inverted_R(base):
    # output-note-iR.osm
    nodes, ways, rels, _ = _run(base, ["note"], invert=True, add_referenced=False)
    assert nodes == ["n10", "n11", "n12", "n13", "n14", "n15"]
    assert (ways, rels) == (["w20"], [])


def test_note_rel_closure(base):
    # output-note-rel.osm: r/note pulls members + their way nodes
    nodes, ways, rels, _ = _run(base, ["r/note"])
    assert nodes == ["n10", "n11", "n12"]
    assert (ways, rels) == (["w20"], ["r30"])


def test_highway_remove_tags(base):
    # output-highway-t.osm: referenced-only nodes are tag-stripped (n11
    # loses barrier=gate)
    nodes, ways, rels, tags = _run(base, ["w/highway"], remove_tags=True)
    assert nodes == ["n10", "n11", "n12", "n13"]
    assert tags["n11"] == []


def test_site_1(site):
    # output-site-1.osm: recursive descent r31 -> r30 -> members
    nodes, ways, rels, _ = _run(site, ["r/site=1"])
    assert nodes == ["n10", "n11", "n12"]
    assert (ways, rels) == (["w20"], ["r30", "r31"])


def test_site_2(site):
    # output-site-2.osm: two-level descent r32 -> r31 -> r30
    nodes, ways, rels, _ = _run(site, ["r/site=2"])
    assert nodes == ["n10", "n11", "n12"]
    assert (ways, rels) == (["w20"], ["r30", "r31", "r32"])


def test_site_R(site):
    # output-site-R.osm / output-site-R-all.osm
    nodes, ways, rels, _ = _run(site, ["r/site=2"], add_referenced=False)
    assert (nodes, ways, rels) == ([], [], ["r32"])
    nodes, ways, rels, _ = _run(site, ["r/site"], add_referenced=False)
    assert (nodes, ways, rels) == ([], [], ["r31", "r32"])


def test_highway_inverted_remove_tags(base):
    """output-highway-it.osm (-i -t w/highway): both highway ways drop;
    w20 returns as a referenced-only member of kept r30 with its tags
    stripped; every node keeps its tags (n15's highway too — the
    expression is way-typed)."""
    images, groups, members = base
    res = run_tags_filter(images, ["w/highway"], groups=groups,
                          members=members, invert=True, remove_tags=True)
    nodes = sorted(r["image_id"] for r in res["images_out"].take_all())
    assert nodes == ["n10", "n11", "n12", "n13", "n14", "n15"]
    tags = {r["image_id"]: r["tags"] for r in res["images_out"].take_all()}
    assert tags["n11"] and tags["n15"]  # node tags survive
    gr = res["group_rows"]
    by_id = {g: (k, ref, t) for g, k, ref, t in zip(
        gr["group_id"].to_pylist(), gr["kind"].to_pylist(),
        gr["referenced_only"].to_pylist(), gr["tags"].to_pylist())}
    assert sorted(by_id) == ["r30", "w20"]
    assert by_id["w20"][1] is True and by_id["w20"][2] == []  # stripped
    assert by_id["r30"][1] is False and by_id["r30"][2]       # note kept


def test_note_rel_remove_tags(base):
    """output-note-rel-t.osm (r/note -t): r30 keeps note; referenced-only
    w20 and nodes (incl. n11's barrier) are tag-stripped."""
    images, groups, members = base
    res = run_tags_filter(images, ["r/note"], groups=groups,
                          members=members, remove_tags=True)
    rows = res["images_out"].take_all()
    assert sorted(r["image_id"] for r in rows) == ["n10", "n11", "n12"]
    assert all(r["tags"] == [] for r in rows)  # all referenced-only
    gr = res["group_rows"]
    by_id = {g: t for g, t in zip(gr["group_id"].to_pylist(),
                                  gr["tags"].to_pylist())}
    assert by_id["w20"] == []
    assert by_id["r30"] and by_id["r30"][0]["key"] == "note"


def test_site_remove_tags(site):
    """output-site-t.osm (r/site -t over input-site): matched r31/r32
    keep site tags; the referenced chain r30 -> w20 -> nodes is
    tag-stripped."""
    images, groups, members = site
    res = run_tags_filter(images, ["r/site"], groups=groups,
                          members=members, remove_tags=True)
    rows = res["images_out"].take_all()
    assert sorted(r["image_id"] for r in rows) == ["n10", "n11", "n12"]
    assert all(r["tags"] == [] for r in rows)
    gr = res["group_rows"]
    by_id = {g: t for g, t in zip(gr["group_id"].to_pylist(),
                                  gr["tags"].to_pylist())}
    assert sorted(by_id) == ["r30", "r31", "r32", "w20"]
    assert by_id["r30"] == [] and by_id["w20"] == []
    assert by_id["r31"][0]["key"] == "site"
    assert by_id["r32"][0]["key"] == "site"


def test_nodes_only_inverted(ray_session):
    """output-nodes-highway-i.osm (-i w/highway over input-nodes): a
    nodes-only stream is untouched by a way-typed inverted expression —
    every node with its tags."""
    import ray.data as rd

    nodes = [("n10", []), ("n11", [_t("barrier", "gate")]), ("n12", []),
             ("n13", []), ("n14", [_t("amenity", "post_box")]),
             ("n15", [_t("highway", "traffic_signals")])]
    images = rd.from_arrow(pa.table({
        "image_id": pa.array([n[0] for n in nodes]),
        "lon": pa.array([1.0] * 6), "lat": pa.array([1.0] * 6),
        "tags": pa.array([n[1] for n in nodes], type=TAGS_TYPE),
    }))
    res = run_tags_filter(images, ["w/highway"], invert=True)
    rows = {r["image_id"]: r["tags"] for r in res["images_out"].take_all()}
    assert sorted(rows) == ["n10", "n11", "n12", "n13", "n14", "n15"]
    assert rows["n15"][0]["key"] == "highway"


def test_area_filter_closed_way(ray_session):
    # a/-prefixed expressions match closed ways (>=4 refs, first==last) and
    # type=multipolygon/boundary relations (command_tags_filter.cpp:203-230)
    nodes = [("n1", []), ("n2", []), ("n3", [])]
    groups = [("w_closed", "way", [_t("landuse", "forest")]),
              ("w_open", "way", [_t("landuse", "forest")]),
              ("r_mp", "relation", [_t("landuse", "forest"), _t("type", "multipolygon")]),
              ("r_plain", "relation", [_t("landuse", "forest")])]
    members = [("w_closed", 0, "node", "n1"), ("w_closed", 1, "node", "n2"),
               ("w_closed", 2, "node", "n3"), ("w_closed", 3, "node", "n1"),
               ("w_open", 0, "node", "n1"), ("w_open", 1, "node", "n2"),
               ("r_mp", 0, "way", "w_closed"), ("r_plain", 0, "way", "w_open")]
    ds3 = _mk(None, nodes, groups, members)
    nodes_out, ways, rels, _ = _run(ds3, ["a/landuse=forest"], add_referenced=False)
    assert ways == ["w_closed"]          # open way fails the area rule
    assert rels == ["r_mp"]              # non-multipolygon relation fails
    assert nodes_out == []
