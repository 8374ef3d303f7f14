"""Golden parity with the reference renumber suite
(/root/reference/test/renumber/CMakeLists.txt): input-sorted.osm with
`-s 0,3,-3` -> output-sorted-s.osm, and `-t node` -> output-sorted-n.osm.

Fixture transcription (ids as strings in our model; numeric sort order
of the originals is preserved by zero-padding the signed ids into a
sortable form): nodes {-11, 11, 12, 14}, ways {20: [-11,11,12],
21: [12,14]}, relation 30 with members node 12, node 13 (UNSEEN — gets a
fresh extra id, command_renumber.cpp m_extra_ids), way 20."""

import numpy as np
import pyarrow as pa


def _fixture():
    import ray.data as rd

    # keys sort like the signed ints: a/-11 < b/11 < c/12 < d/14
    images = rd.from_arrow(pa.table({
        "image_id": pa.array(["a-11", "b11", "c12", "d14"], type=pa.string()),
        "lat": pa.array([1.0, 2.0, 3.0, 4.0]),
    }))
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array(["w20", "w21", "r30"], type=pa.string()),
        "kind": pa.array(["way", "way", "relation"], type=pa.string()),
    }))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array(["w20"] * 3 + ["w21"] * 2 + ["r30"] * 3,
                             type=pa.string()),
        "seq": pa.array(list(range(3)) + list(range(2)) + list(range(3)),
                        type=pa.int32()),
        "mtype": pa.array(["node"] * 5 + ["node", "node", "way"],
                          type=pa.string()),
        "ref": pa.array(["a-11", "b11", "c12", "c12", "d14",
                         "c12", "c13", "w20"], type=pa.string()),
    }))
    return images, groups, members


def test_renumber_golden_start_ids(ray_session):
    """`-s 0,3,-3` -> output-sorted-s.osm: nodes 1..4 (start 0 = default
    1), ways 3,4, relation -3 (negative start counts DOWN), and the
    unseen node ref 13 gets the next node id 5."""
    from osmium_tool_ray.pipelines.idops import renumber_with_refs

    images, groups, members = _fixture()
    img_out, grp_out, mem_out, maps = renumber_with_refs(
        images, groups, members, starts={"node": 0, "way": 3, "relation": -3})
    assert maps["node"] == {"a-11": 1, "b11": 2, "c12": 3, "d14": 4, "c13": 5}
    assert maps["way"] == {"w20": 3, "w21": 4}
    assert maps["relation"] == {"r30": -3}
    mem = mem_out.to_pandas().sort_values(["group_id", "seq"]) \
        .reset_index(drop=True)
    r30 = mem[mem.group_id == "r30"]
    assert r30["new_ref"].tolist() == [3, 5, 3]       # node 12->3, 13->5, way 20->3
    assert r30["new_group_id"].tolist() == [-3, -3, -3]


def test_renumber_golden_nodes_only(ray_session):
    """`-t node` -> output-sorted-n.osm: only nodes renumbered; way and
    relation ids keep their old values (null new ids), but node refs
    INSIDE ways/relations are remapped (13 -> 5)."""
    from osmium_tool_ray.pipelines.idops import renumber_with_refs

    images, groups, members = _fixture()
    _, grp_out, mem_out, maps = renumber_with_refs(
        images, groups, members, types=("node",))
    assert maps["node"]["c13"] == 5 and "way" not in maps
    grp = grp_out.to_pandas()
    assert grp["new_id"].isna().all()
    mem = mem_out.to_pandas().sort_values(["group_id", "seq"]) \
        .reset_index(drop=True)
    w20 = mem[mem.group_id == "w20"]
    assert w20["new_ref"].tolist() == [1, 2, 3]
    r30 = mem[mem.group_id == "r30"]
    # node members remapped; the way member keeps its old id (null new)
    assert r30["new_ref"].tolist()[:2] == [3, 5]
    assert np.isnan(r30["new_ref"].tolist()[2])
    assert r30["new_group_id"].isna().all()


def test_renumber_ranked_signed_starts(ray_session):
    """The sharded-mapping scale path honours the same signed-start
    formula as the broadcast form."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.idops import renumber_ranked

    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(["x", "y", "z"], type=pa.string())}))
    up = renumber_ranked(ds, "image_id", start=10).to_pandas() \
        .sort_values("image_id")
    assert up["new_id"].tolist() == [10, 11, 12]
    down = renumber_ranked(ds, "image_id", start=-3).to_pandas() \
        .sort_values("image_id")
    assert down["new_id"].tolist() == [-3, -4, -5]
    zero = renumber_ranked(ds, "image_id", start=0).to_pandas() \
        .sort_values("image_id")
    assert zero["new_id"].tolist() == [1, 2, 3]
