"""T4: getid / removeid / getparents / check-refs / renumber over the T1
topology (closure semantics of command_getid.cpp:311-333 etc.)."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.idops import (
    check_refs, getid, getparents, parse_id_list, removeid, renumber,
)
from tests.test_extract_strategies import GROUPS, MEMBERS, NODES


@pytest.fixture(scope="module")
def datasets(ray_session):
    import ray.data as rd

    images = rd.from_arrow(pa.table({
        "image_id": pa.array(list(NODES)),
        "lon": pa.array([c[0] for c in NODES.values()]),
        "lat": pa.array([c[1] for c in NODES.values()]),
    }))
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array([g[0] for g in GROUPS]),
        "kind": pa.array([g[1] for g in GROUPS]),
    }))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array([m[0] for m in MEMBERS]),
        "seq": pa.array([m[1] for m in MEMBERS], type=pa.int32()),
        "mtype": pa.array([m[2] for m in MEMBERS]),
        "ref": pa.array([m[3] for m in MEMBERS]),
    }))
    return images, groups, members


def test_parse_id_list():
    ids = parse_id_list(["n13", "w20", "r35", "# comment", "", "n13"])
    assert ids["node"].tolist() == ["n13"]
    assert ids["way"].tolist() == ["w20"]
    assert ids["relation"].tolist() == ["r35"]


def test_getid_plain(datasets):
    images, groups, members = datasets
    res = getid(images, parse_id_list(["n13", "w20"]), groups=groups, members=members)
    assert [r["image_id"] for r in res["images_out"].take_all()] == ["n13"]
    assert res["group_rows"]["group_id"].to_pylist() == ["w20"]


def test_getid_recursive(datasets):
    # r35 -> member r31 (recursion) -> node n10; w20 -> nodes n11,n12,n13
    images, groups, members = datasets
    res = getid(images, parse_id_list(["r35", "w20"]), groups=groups,
                members=members, recursive=True)
    nodes = sorted(r["image_id"] for r in res["images_out"].take_all())
    assert nodes == ["n10", "n11", "n12", "n13"]
    gr = res["group_rows"]
    rels = gr.filter(pa.compute.equal(gr["kind"], "relation"))["group_id"].to_pylist()
    assert sorted(rels) == ["r31", "r35"]
    ref_only = dict(zip(gr["group_id"].to_pylist(), gr["referenced_only"].to_pylist()))
    assert ref_only["r31"] and not ref_only["r35"]


def test_getid_recursive_cycle(ray_session):
    # relloop.osm analogue: cyclic relation refs must terminate
    import ray.data as rd

    images = rd.from_items([{"image_id": "n1", "lon": 0.0, "lat": 0.0}])
    members = rd.from_arrow(pa.table({
        "group_id": pa.array(["rA", "rB"]),
        "seq": pa.array([0, 0], type=pa.int32()),
        "mtype": pa.array(["relation", "relation"]),
        "ref": pa.array(["rB", "rA"]),
    }))
    groups = rd.from_arrow(pa.table({"group_id": pa.array(["rA", "rB"]),
                                     "kind": pa.array(["relation", "relation"])}))
    res = getid(images, parse_id_list(["rA"]), groups=groups, members=members,
                recursive=True)
    gr = res["group_rows"]
    assert sorted(gr["group_id"].to_pylist()) == ["rA", "rB"]


def test_removeid(datasets):
    images, _, _ = datasets
    out = removeid(images, np.asarray(["n10", "n16"], dtype=object))
    assert sorted(r["image_id"] for r in out.take_all()) == \
        ["n11", "n12", "n13", "n14", "n15"]


def test_getparents(datasets):
    _, groups, members = datasets
    # ways/relations containing n13: w20, r32
    out = getparents(members, {"node": np.asarray(["n13"], dtype=object)})
    assert out["group_id"].to_pylist() == ["r32", "w20"]
    # parents of w20: r33, r34; --add-self unions the input
    out = getparents(members, {"way": np.asarray(["w20"], dtype=object)}, add_self=True)
    assert out["group_id"].to_pylist() == ["r33", "r34", "w20"]


def test_check_refs(datasets):
    images, groups, members = datasets
    res = check_refs(images, members, groups=groups, check_relations=True)
    assert res["ok"]
    # drop n13 from images -> 1 missing node-in-way (w20) + 1 in relation (r32)
    import ray.data as rd
    images2 = removeid(images, np.asarray(["n13"], dtype=object))
    res = check_refs(images2, members, groups=groups, check_relations=True)
    assert res["nodes_in_ways"] == 1
    assert res["nodes_in_relations"] == 1
    assert not res["ok"]


def test_renumber(datasets):
    images, _, _ = datasets
    out, mapping = renumber(images, "image_id", out_col="new_id")
    rows = sorted(out.take_all(), key=lambda r: r["image_id"])
    # order-preserving dense ids 1..7 (command_renumber.cpp:61-66)
    assert [r["new_id"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    assert mapping["n10"] == 1 and mapping["n16"] == 7


def test_renumber_ranked_matches_broadcast(datasets):
    from osmium_tool_ray.pipelines.idops import renumber_ranked

    images, _, _ = datasets
    _, mapping = renumber(images, "image_id", out_col="new_id")
    ranked = renumber_ranked(images, "image_id").take_all()
    assert {r["image_id"]: r["new_id"] for r in ranked} == mapping
