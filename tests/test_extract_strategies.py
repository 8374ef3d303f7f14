"""T1 fixture: exact replica of /root/reference/test/extract/input1.osm and
its golden outputs (output-simple.osm, output-complete-ways[-norels].osm,
output-smart.osm) re-expressed over the image corpus schema."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.extract import run_extract
from osmium_tool_ray.state.regions import parse_extract_config

# input1.osm topology: nodes n10..n16 at the reference coordinates
NODES = {
    "n10": (1.0, 0.0), "n11": (1.0, 1.0), "n12": (1.0, 2.0), "n13": (2.0, 3.0),
    "n14": (2.0, 4.0), "n15": (2.0, 5.0), "n16": (2.0, 6.0),
}
GROUPS = [
    ("w20", "way", [{"key": "foo", "value": "bar"}]),
    ("w21", "way", [{"key": "xyz", "value": "abc"}]),
    ("r31", "relation", []),
    ("r32", "relation", []),
    ("r33", "relation", []),
    ("r34", "relation", [{"key": "type", "value": "multipolygon"}]),
    ("r35", "relation", []),
    ("r36", "relation", []),
]
MEMBERS = [
    ("w20", 0, "node", "n11"), ("w20", 1, "node", "n12"), ("w20", 2, "node", "n13"),
    ("w21", 0, "node", "n14"), ("w21", 1, "node", "n15"),
    ("r31", 0, "node", "n10"),
    ("r32", 0, "node", "n13"),
    ("r33", 0, "way", "w20"),
    ("r34", 0, "way", "w20"), ("r34", 1, "way", "w21"),
    ("r35", 0, "relation", "r31"),
    ("r36", 0, "relation", "r35"),
]
REGIONS = parse_extract_config({"extracts": [{"output": "x", "bbox": [0, 0, 1.5, 10]}]})


@pytest.fixture(scope="module")
def datasets(ray_session):
    import ray.data as rd

    images = rd.from_arrow(pa.table({
        "image_id": pa.array(list(NODES), type=pa.string()),
        "lon": pa.array([c[0] for c in NODES.values()], type=pa.float64()),
        "lat": pa.array([c[1] for c in NODES.values()], type=pa.float64()),
    }))
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array([g[0] for g in GROUPS]),
        "kind": pa.array([g[1] for g in GROUPS]),
        "tags": pa.array([g[2] for g in GROUPS],
                         type=pa.list_(pa.struct([("key", pa.string()),
                                                  ("value", pa.string())]))),
    }))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array([m[0] for m in MEMBERS]),
        "seq": pa.array([m[1] for m in MEMBERS], type=pa.int32()),
        "mtype": pa.array([m[2] for m in MEMBERS]),
        "ref": pa.array([m[3] for m in MEMBERS]),
    }))
    return images, groups, members


def _run(datasets, strategy, options=None):
    images, groups, members = datasets
    res = run_extract(images, REGIONS, groups=groups, members=members,
                      strategy=strategy, options=options, concurrency=2)
    img_rows = res["images_out"].take_all()
    nodes = sorted({r["image_id"] for r in img_rows})
    gr = res["group_rows"]
    ways = sorted(gr.filter(pa.compute.equal(gr["kind"], "way"))["group_id"].to_pylist())
    rels = sorted(gr.filter(pa.compute.equal(gr["kind"], "relation"))["group_id"].to_pylist())
    return nodes, ways, rels


def test_simple(datasets):
    # golden: output-simple.osm — n10,n11,n12 / w20 / r31,r33,r34
    nodes, ways, rels = _run(datasets, "simple")
    assert nodes == ["n10", "n11", "n12"]
    assert ways == ["w20"]
    assert rels == ["r31", "r33", "r34"]


def test_complete_ways(datasets):
    # golden: output-complete-ways.osm — +n13 (extra node of w20), +r35,r36
    # (recursive parent closure of r31)
    nodes, ways, rels = _run(datasets, "complete_ways")
    assert nodes == ["n10", "n11", "n12", "n13"]
    assert ways == ["w20"]
    assert rels == ["r31", "r33", "r34", "r35", "r36"]


def test_complete_ways_norels(datasets):
    # golden: output-complete-ways-norels.osm (-S relations=false)
    nodes, ways, rels = _run(datasets, "complete_ways", {"relations": "false"})
    assert nodes == ["n10", "n11", "n12", "n13"]
    assert ways == ["w20"]
    assert rels == []


def test_smart(datasets):
    # golden: output-smart.osm — +w21 and its nodes n14,n15 via multipolygon r34
    nodes, ways, rels = _run(datasets, "smart")
    assert nodes == ["n10", "n11", "n12", "n13", "n14", "n15"]
    assert ways == ["w20", "w21"]
    assert rels == ["r31", "r33", "r34", "r35", "r36"]


def test_smart_types_any(datasets):
    # -S types=any: r33 (way member, has no tags) adds nothing extra; results
    # must still include w21 via r34 and remain a superset of smart default
    nodes, ways, rels = _run(datasets, "smart", {"types": "any"})
    assert "w21" in ways and "n14" in nodes


def test_complete_ways_with_history(ray_session):
    """strategy_complete_ways_with_history.cpp semantics: any version of a
    node inside the extract marks its id; the way closure pulls member
    node ids; ALL versions of every marked id are emitted — including
    versions whose own coordinates lie outside the region."""
    import ray.data as rd

    from osmium_tool_ray.state.regions import parse_extract_config

    # n1 v1 inside, v2 outside; n2 both versions outside but referenced by
    # w1 (which also holds n1); n3 outside and unreferenced
    images = rd.from_arrow(pa.table({
        "image_id": pa.array(["n1", "n1", "n2", "n2", "n3"]),
        "version": pa.array([1, 2, 1, 2, 1], type=pa.int32()),
        "lon": pa.array([1.0, 50.0, 60.0, 61.0, 70.0]),
        "lat": pa.array([1.0, 50.0, 60.0, 61.0, 70.0]),
    }))
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1"]), "kind": pa.array(["way"]),
        "tags": pa.array([[]], type=pa.list_(pa.struct(
            [("key", pa.string()), ("value", pa.string())]))),
    }))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1", "w1"]),
        "seq": pa.array([0, 1], type=pa.int32()),
        "mtype": pa.array(["node", "node"]),
        "ref": pa.array(["n1", "n2"]),
    }))
    regions = parse_extract_config({"extracts": [{"output": "x",
                                                  "bbox": [0, 0, 2, 2]}]})
    res = run_extract(images, regions, groups=groups, members=members,
                      strategy="complete_ways_with_history", concurrency=2)
    rows = sorted((r["image_id"], r["version"])
                  for r in res["images_out"].take_all())
    assert rows == [("n1", 1), ("n1", 2), ("n2", 1), ("n2", 2)]
    gids = sorted(res["group_rows"]["group_id"].to_pylist())
    assert gids == ["w1"]


def test_complete_ways_dataset_path_parity(datasets):
    """run_extract_cw_dataset (id sets as Datasets, hash-join closure)
    must reproduce the broadcast path bit-for-bit on the golden fixture,
    relations included."""
    from osmium_tool_ray.pipelines.extract import run_extract_cw_dataset

    images, groups, members = datasets
    a = run_extract(images, REGIONS, groups=groups, members=members,
                    strategy="complete_ways", concurrency=2)
    b = run_extract_cw_dataset(images, REGIONS, groups=groups,
                               members=members, concurrency=2)
    assert sorted(r["image_id"] for r in a["images_out"].take_all()) == \
        sorted(r["image_id"] for r in b["images_out"].take_all())
    ga = sorted(zip(a["group_rows"]["group_id"].to_pylist(),
                    a["group_rows"]["kind"].to_pylist()))
    gb = sorted(zip(b["group_rows"]["group_id"].to_pylist(),
                    b["group_rows"]["kind"].to_pylist()))
    assert ga == gb
