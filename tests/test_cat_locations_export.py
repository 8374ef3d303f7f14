import json
import os

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.cat import cat, clean_batch
from osmium_tool_ray.pipelines.export import (
    export_lines, render_geojson_points, render_pg_copy,
)
from osmium_tool_ray.pipelines.locations import (
    add_locations_to_members, create_locations_index, lookup_locations,
)
from osmium_tool_ray.sources.opl import parse_opl_lines, read_opl, render_opl_nodes


def test_cat_union_types_clean(ray_session):
    import ray.data as rd

    a = rd.from_items([{"id": 1, "kind": "node", "caption": "x", "version": 3}])
    b = rd.from_items([{"id": 2, "kind": "way", "caption": "y", "version": 4}])
    out = cat([a, b]).take_all()
    assert len(out) == 2
    out = cat([a, b], object_types=["node"]).take_all()
    assert [r["id"] for r in out] == [1]
    out = cat([a, b], clean=["caption", "version"]).take_all()
    assert all(r["caption"] == "" and r["version"] == 0 for r in out)
    with pytest.raises(ValueError, match="Unknown attribute"):
        clean_batch(pa.table({"bogus_attr": [1]}), ["bogus_attr"])


def test_add_locations(ray_session):
    import ray.data as rd

    images = rd.from_items([{"image_id": "n1", "lon": 1.0, "lat": 2.0},
                            {"image_id": "n2", "lon": 3.0, "lat": 4.0}])
    members = rd.from_items([
        {"group_id": "w1", "seq": 0, "mtype": "node", "ref": "n1"},
        {"group_id": "w1", "seq": 1, "mtype": "node", "ref": "n2"},
        {"group_id": "w1", "seq": 2, "mtype": "node", "ref": "n9"},  # dangling
        {"group_id": "r1", "seq": 0, "mtype": "way", "ref": "w1"},
    ])
    out = sorted(add_locations_to_members(members, images).take_all(),
                 key=lambda r: r["seq"])
    assert [(r["ref"], r["lon"], r["lat"]) for r in out] == \
        [("n1", 1.0, 2.0), ("n2", 3.0, 4.0)]
    kept = add_locations_to_members(members, images, keep_missing=True).take_all()
    assert len(kept) == 4


def test_add_locations_bucketed_parity(ray_session):
    """Forced scale path: broadcast_cap=0 routes through the hash-bucket
    searchsorted join. Rows, columns and values must match the broadcast
    path exactly on both keep_missing settings."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    images = rd.from_items([{"image_id": f"n{i}", "lon": float(i) / 7,
                             "lat": -float(i) / 3} for i in range(200)])
    members = rd.from_items([
        {"group_id": f"w{i % 9}", "seq": i,
         "mtype": "node" if i % 5 else "way",
         "ref": f"n{int(rng.integers(0, 260))}"}
        for i in range(500)])

    def canon(rows):
        return sorted(
            [(r["group_id"], r["seq"], r["mtype"], r["ref"],
              None if r["lon"] is None or (isinstance(r["lon"], float)
                                           and np.isnan(r["lon"]))
              else r["lon"],
              None if r["lat"] is None or (isinstance(r["lat"], float)
                                           and np.isnan(r["lat"]))
              else r["lat"]) for r in rows],
            key=lambda t: (t[0], t[1]))

    for km in (False, True):
        broad = add_locations_to_members(members, images,
                                         keep_missing=km).take_all()
        bucketed = add_locations_to_members(members, images,
                                            keep_missing=km,
                                            broadcast_cap=0).take_all()
        assert canon(bucketed) == canon(broad)


def test_locations_index_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    images = rd.from_items([{"image_id": f"n{i}", "lon": float(i), "lat": -float(i)}
                            for i in range(100)])
    path = create_locations_index(images, str(tmp_path / "locidx"))
    got = lookup_locations(path, ["n5", "n42", "nMISSING"])
    rows = sorted(got.to_pylist(), key=lambda r: r["image_id"])
    assert [(r["image_id"], r["lon"]) for r in rows] == [("n42", 42.0), ("n5", 5.0)]


def test_render_geojson_and_pg():
    t = pa.table({"image_id": ['a"b'], "lon": [1.5], "lat": [-2.0],
                  "caption": ["he\tllo"]})
    line = render_geojson_points(t, props=["caption"])["line"][0].as_py()
    feat = json.loads(line)
    assert feat["geometry"]["coordinates"] == [1.5, -2.0]
    assert feat["id"] == 'a"b'
    assert feat["properties"]["caption"] == "he\tllo"
    pg = render_pg_copy(t, ["image_id", "caption"])["line"][0].as_py()
    assert pg == 'a"b\the\\tllo'


def test_export_lines_sink(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.from_items([{"image_id": f"i{k}", "lon": float(k), "lat": 0.0}
                        for k in range(10)])
    out = export_lines(ds, str(tmp_path / "geojsonseq"), render_geojson_points)
    lines = []
    for f in os.listdir(out):
        lines += open(os.path.join(out, f)).read().splitlines()
    assert len(lines) == 10
    assert all(json.loads(l)["type"] == "Feature" for l in lines)


OPL_SAMPLE = [
    "n1 v1 dV c9 t2020-01-01T00:00:00Z i7 ualice T x1.5 y-2.5",
    "n2 v2 dD c9 t2020-01-02T00:00:00Z i7 ubob%20%jr Thighway=stop,name=A%20%B x0 y0",
    "w10 v1 dV c9 t2020-01-01T00:00:00Z i7 ualice Thighway=primary Nn1,n2",
    "r20 v1 dV c9 t2020-01-01T00:00:00Z i7 ualice Ttype=route Mn1@stop,w10@",
]


def test_parse_opl():
    t = parse_opl_lines(OPL_SAMPLE)
    nodes = t["nodes"].to_pylist()
    assert nodes[0]["image_id"] == "n1" and nodes[0]["lon"] == 1.5
    assert nodes[1]["visible"] is False
    assert nodes[1]["user"] == "bob jr"
    assert nodes[1]["tags"][1] == {"key": "name", "value": "A B"}
    groups = t["groups"].to_pylist()
    assert [g["group_id"] for g in groups] == ["w10", "r20"]
    mem = t["group_members"].to_pylist()
    assert [(m["group_id"], m["mtype"], m["ref"], m["role"]) for m in mem] == [
        ("w10", "node", "n1", ""), ("w10", "node", "n2", ""),
        ("r20", "node", "n1", "stop"), ("r20", "way", "w10", "")]


def test_opl_roundtrip(tmp_path, ray_session):
    p = tmp_path / "sample.opl"
    p.write_text("\n".join(OPL_SAMPLE) + "\n")
    dsets = read_opl(str(p))
    nodes = dsets["nodes"].take_all()
    assert len(nodes) == 2
    assert dsets["group_members"].count() == 4
    # writer direction: render nodes back to OPL and re-parse
    tbl = parse_opl_lines(OPL_SAMPLE)["nodes"]
    lines = render_opl_nodes(tbl)["line"].to_pylist()
    again = parse_opl_lines(lines)["nodes"]
    assert again["image_id"].to_pylist() == tbl["image_id"].to_pylist()
    assert again["lon"].to_pylist() == tbl["lon"].to_pylist()
    assert again["user"].to_pylist() == tbl["user"].to_pylist()
    assert again["tags"].to_pylist() == tbl["tags"].to_pylist()


def test_opl_bad_type():
    with pytest.raises(ValueError, match="Unknown OPL object type"):
        parse_opl_lines(["z1 v1"])


def test_apply_location_changes(ray_session):
    """--locations-on-ways: modify patches lon/lat in place, delete drops
    the member row (command_apply_changes.cpp:200-277)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.locations import apply_location_changes

    located = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1"] * 3),
        "seq": pa.array([0, 1, 2], type=pa.int32()),
        "ref": pa.array(["n1", "n2", "n3"]),
        "lon": pa.array([1.0, 2.0, 3.0]),
        "lat": pa.array([1.0, 2.0, 3.0]),
    }))
    changes = rd.from_arrow(pa.table({
        "image_id": pa.array(["n1", "n3"]),
        "lon": pa.array([9.0, 0.0]),
        "lat": pa.array([9.5, 0.0]),
        "op": pa.array(["modify", "delete"]),
    }))
    out = sorted(apply_location_changes(located, changes).take_all(),
                 key=lambda r: r["seq"])
    assert [(r["ref"], r["lon"], r["lat"]) for r in out] == \
        [("n1", 9.0, 9.5), ("n2", 2.0, 2.0)]


def test_assemble_rings_from_open_fragments():
    """Ring merging: three open fragments (one reversed) close into one
    square ring; a dangling fragment is reported as leftover."""
    from osmium_tool_ray.functions.geometry import assemble_rings, is_ccw

    f1 = [[0.0, 0.0], [2.0, 0.0]]
    f2 = [[2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]
    f3 = [[0.0, 0.0], [0.0, 2.0]]          # joins reversed
    dangling = [[9.0, 9.0], [9.5, 9.5]]
    rings, leftover = assemble_rings([f1, f2, f3, dangling])
    assert len(rings) == 1 and leftover == [3]
    r = rings[0]
    assert np.array_equal(r[0], r[-1]) and len(r) == 5
    assert {tuple(p) for p in r.tolist()} == \
        {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)}


def test_assemble_rings_two_rings_and_closed_input():
    from osmium_tool_ray.functions.geometry import assemble_rings

    closed = [[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]
    a1 = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]
    a2 = [[1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    rings, leftover = assemble_rings([closed, a1, a2])
    assert len(rings) == 2 and leftover == []


def test_render_geojson_areas_multipolygon_with_hole(ray_session):
    """Full area assembly: outer square from 3 OPEN fragments + a closed
    inner hole; outer must come out CCW, hole CW (geometry_util rules)."""
    import json

    import ray.data as rd

    from osmium_tool_ray.functions.geometry import double_area
    from osmium_tool_ray.pipelines.export import render_geojson_areas

    way_pts = {
        "w1": [[0.0, 0.0], [4.0, 0.0]],
        "w2": [[4.0, 0.0], [4.0, 4.0], [0.0, 4.0]],
        "w3": [[0.0, 4.0], [0.0, 0.0]],
        "w4": [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],
    }
    rows = []
    for wid, pts in way_pts.items():
        for s, (lo, la) in enumerate(pts):
            rows.append({"group_id": wid, "seq": s, "lon": lo, "lat": la})
    wm = rd.from_items(rows)
    rel = rd.from_items([
        {"group_id": "r1", "seq": i, "mtype": "way", "ref": w}
        for i, w in enumerate(["w1", "w2", "w3", "w4"])])
    out = render_geojson_areas(rel, wm).take_all()
    assert len(out) == 1
    feat = json.loads(out[0]["line"])
    polys = feat["geometry"]["coordinates"]
    assert feat["id"] == "r1" and len(polys) == 1
    shell, hole = polys[0]
    assert double_area(np.asarray(shell)) > 0      # outer CCW
    assert double_area(np.asarray(hole)) < 0       # inner CW
    assert len(shell) == 5 and len(hole) == 5
