"""Round-1 gap closures: history strategy parity, renumber refs remap,
bucketed semi-join, export geometry assembly, tags-filter -t on groups."""

import json

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.export import (
    render_geojson_multipolygons, render_geojson_ways,
)
from osmium_tool_ray.pipelines.extract import run_extract
from osmium_tool_ray.pipelines.idops import (
    renumber_with_refs, semi_join, semi_join_bucketed,
)
from osmium_tool_ray.pipelines.locations import add_locations_to_members
from osmium_tool_ray.schema import TAGS_TYPE
from osmium_tool_ray.state.regions import parse_extract_config


def test_complete_ways_history_semantics(ray_session):
    """strategy_complete_ways_with_history.cpp: ANY version of a way inside
    => node refs of ALL its versions kept. Our id-keyed set implementation
    gives this over versioned member tables."""
    import ray.data as rd

    # n1 inside bbox; way w1 has two versions: v1=[n1], v2=[n2] (n2 outside)
    images = rd.from_items([
        {"image_id": "n1", "version": 1, "lon": 1.0, "lat": 1.0},
        {"image_id": "n2", "version": 1, "lon": 50.0, "lat": 50.0},
    ])
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1", "w1"]), "kind": pa.array(["way", "way"]),
        "tags": pa.array([[], []], type=TAGS_TYPE)}))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1", "w1"]),
        "seq": pa.array([0, 0], type=pa.int32()),
        "mtype": pa.array(["node", "node"]),
        "ref": pa.array(["n1", "n2"]),  # v1 member, v2 member
    }))
    regions = parse_extract_config({"extracts": [{"output": "x", "bbox": [0, 0, 2, 2]}]})
    res = run_extract(images, regions, groups=groups, members=members,
                      strategy="complete_ways", concurrency=2)
    nodes = sorted(r["image_id"] for r in res["images_out"].take_all())
    assert nodes == ["n1", "n2"]  # n2 kept: it is a ref of SOME version of w1


def test_renumber_with_refs(ray_session):
    import ray.data as rd

    images = rd.from_items([{"image_id": f"n{i}", "lon": 0.0, "lat": 0.0}
                            for i in (5, 2, 9)])
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array(["w7", "w3", "r1"]),
        "kind": pa.array(["way", "way", "relation"])}))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array(["w7", "w3", "r1", "r1"]),
        "seq": pa.array([0, 0, 0, 1], type=pa.int32()),
        "mtype": pa.array(["node", "node", "way", "relation"]),
        "ref": pa.array(["n9", "n2", "w7", "r1"]),
    }))
    img, grp, mem, maps = renumber_with_refs(images, groups, members)
    assert maps["node"] == {"n2": 1, "n5": 2, "n9": 3}
    assert maps["way"] == {"w3": 1, "w7": 2}
    assert maps["relation"] == {"r1": 1}
    mem_rows = sorted(mem.take_all(), key=lambda r: (r["group_id"], r["seq"]))
    assert [(r["new_group_id"], r["mtype"], r["new_ref"]) for r in mem_rows] == \
        [(1, "way", 2), (1, "relation", 1), (1, "node", 1), (2, "node", 3)]


def test_bucketed_semi_join_matches_broadcast(ray_session):
    import ray.data as rd

    big = rd.from_items([{"image_id": f"i{k}", "payload": k} for k in range(500)])
    wanted = [f"i{k}" for k in range(0, 500, 7)]
    ids_ds = rd.from_items([{"image_id": w} for w in wanted])
    a = sorted(r["image_id"] for r in
               semi_join(big, "image_id", np.asarray(wanted, dtype=object)).take_all())
    b = sorted(r["image_id"] for r in
               semi_join_bucketed(big, "image_id", ids_ds, buckets=8).take_all())
    assert a == b and len(a) == len(wanted)
    # anti mode
    c = sorted(r["image_id"] for r in
               semi_join_bucketed(big, "image_id", ids_ds, buckets=8,
                                  invert=True).take_all())
    assert len(c) == 500 - len(wanted)
    assert not set(c) & set(wanted)


def test_render_ways_and_multipolygons(ray_session):
    import ray.data as rd

    images = rd.from_items([
        {"image_id": "n1", "lon": 0.0, "lat": 0.0},
        {"image_id": "n2", "lon": 1.0, "lat": 0.0},
        {"image_id": "n3", "lon": 1.0, "lat": 1.0},
        {"image_id": "n4", "lon": 0.0, "lat": 1.0},
    ])
    # w1: open line n1-n2-n3; w2: closed ring n1-n2-n3-n4-n1
    mem_rows = [("w1", 0, "n1"), ("w1", 1, "n2"), ("w1", 2, "n3"),
                ("w2", 0, "n1"), ("w2", 1, "n2"), ("w2", 2, "n3"),
                ("w2", 3, "n4"), ("w2", 4, "n1")]
    members = rd.from_arrow(pa.table({
        "group_id": pa.array([m[0] for m in mem_rows]),
        "seq": pa.array([m[1] for m in mem_rows], type=pa.int32()),
        "mtype": pa.array(["node"] * len(mem_rows)),
        "ref": pa.array([m[2] for m in mem_rows]),
    }))
    located = add_locations_to_members(members, images)
    feats = {json.loads(r["line"])["id"]: json.loads(r["line"])
             for r in render_geojson_ways(located, closed_as_polygon=True).take_all()}
    assert feats["w1"]["geometry"]["type"] == "LineString"
    assert len(feats["w1"]["geometry"]["coordinates"]) == 3
    assert feats["w2"]["geometry"]["type"] == "Polygon"

    rel = rd.from_arrow(pa.table({
        "group_id": pa.array(["r1"]), "seq": pa.array([0], type=pa.int32()),
        "mtype": pa.array(["way"]), "ref": pa.array(["w2"]),
    }))
    mp = render_geojson_multipolygons(rel, located).take_all()
    f = json.loads(mp[0]["line"])
    assert f["geometry"]["type"] == "MultiPolygon"
    assert len(f["geometry"]["coordinates"]) == 1


def test_tags_filter_group_tag_strip(ray_session):
    from tests.test_tags_filter import _mk, _t
    from osmium_tool_ray.pipelines.tags_filter import run_tags_filter

    nodes = [("n1", [])]
    groups = [("w1", "way", [_t("highway", "x")]),
              ("r1", "relation", [_t("note", "t"), _t("site", "1")])]
    members = [("w1", 0, "node", "n1"), ("r1", 0, "way", "w1")]
    images, gds, mds = _mk(None, nodes, groups, members)
    res = run_tags_filter(images, ["r/note"], groups=gds, members=mds,
                          remove_tags=True)
    gr = {r["group_id"]: r for r in res["group_rows"].to_pylist()}
    assert gr["r1"]["tags"] == [{"key": "note", "value": "t"},
                                {"key": "site", "value": "1"}]  # matched: kept
    assert gr["w1"]["referenced_only"] and gr["w1"]["tags"] == []  # stripped
