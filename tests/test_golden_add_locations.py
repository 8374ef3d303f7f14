"""Golden parity with the reference add-locations-to-ways suite
(/root/reference/test/add-locations-to-ways/CMakeLists.txt): input.osm ->
output.osm (locations embedded on way members; only TAGGED nodes kept),
output-n.osm (-n keeps all nodes), and input-rel.osm -> output-rel.osm
(--keep-member-nodes keeps relation-member nodes). Includes the negative
node id (-2) case."""

import pyarrow as pa

from osmium_tool_ray.pipelines.locations import (
    add_locations_to_members, retained_nodes,
)


def _nodes(ids_lats_tagged):
    return pa.table({
        "image_id": pa.array([i for i, _, _ in ids_lats_tagged]),
        "lon": pa.array([1.0] * len(ids_lats_tagged)),
        "lat": pa.array([la for _, la, _ in ids_lats_tagged]),
        "tagged": pa.array([t for _, _, t in ids_lats_tagged]),
    })


def _members(rows):
    return pa.table({
        "group_id": pa.array([r[0] for r in rows]),
        "seq": pa.array([r[1] for r in rows], type=pa.int32()),
        "mtype": pa.array([r[2] for r in rows]),
        "ref": pa.array([r[3] for r in rows]),
    })


# input.osm: nodes 10,11,12 untagged / 13 tagged / -2 untagged (negative)
INPUT_NODES = [("10", 1.0, False), ("11", 2.0, False), ("12", 3.0, False),
               ("13", 4.0, True), ("-2", 5.0, False)]
INPUT_MEMBERS = [("w20", 0, "node", "10"), ("w20", 1, "node", "11"),
                 ("w20", 2, "node", "12"),
                 ("w21", 0, "node", "12"), ("w21", 1, "node", "-2"),
                 ("w21", 2, "node", "13")]


def test_add_locations_embeds_member_locations(ray_session):
    """output.osm way members carry the node lat/lon, including the
    negative-id node -2 (nd ref=-2 lat=5 lon=1)."""
    import ray.data as rd

    out = add_locations_to_members(rd.from_arrow(_members(INPUT_MEMBERS)),
                                   rd.from_arrow(_nodes(INPUT_NODES)))
    rows = {(r["group_id"], r["seq"]): (r["lat"], r["lon"])
            for r in out.take_all()}
    assert rows[("w20", 0)] == (1.0, 1.0)
    assert rows[("w20", 1)] == (2.0, 1.0)
    assert rows[("w20", 2)] == (3.0, 1.0)
    assert rows[("w21", 0)] == (3.0, 1.0)
    assert rows[("w21", 1)] == (5.0, 1.0)   # node -2
    assert rows[("w21", 2)] == (4.0, 1.0)
    assert len(rows) == 6


def test_retained_nodes_tagged_only(ray_session):
    """output.osm: only the tagged node 13 remains in the node stream."""
    import ray.data as rd

    out = retained_nodes(rd.from_arrow(_nodes(INPUT_NODES)))
    assert [r["image_id"] for r in out.take_all()] == ["13"]


def test_retained_nodes_keep_all(ray_session):
    """output-n.osm (-n): every node kept."""
    import ray.data as rd

    out = retained_nodes(rd.from_arrow(_nodes(INPUT_NODES)), keep_all=True)
    assert sorted(r["image_id"] for r in out.take_all()) == \
        ["-2", "10", "11", "12", "13"]


def test_retained_nodes_keep_member_nodes(ray_session):
    """input-rel.osm -> output-rel.osm (--keep-member-nodes): node 11 is
    a relation member -> kept; 13 tagged -> kept; 10, 12 (only way
    members) dropped. Relation ownership comes from the groups table's
    kind column, not an id prefix."""
    import ray.data as rd

    nodes = [("10", 1.0, False), ("11", 2.0, False), ("12", 3.0, False),
             ("13", 4.0, True)]
    members = [("w20", 0, "node", "10"), ("w20", 1, "node", "12"),
               ("r31", 0, "node", "11"), ("r31", 1, "way", "w20")]
    groups = pa.table({
        "group_id": pa.array(["w20", "r31"]),
        "kind": pa.array(["way", "relation"]),
    })
    out = retained_nodes(rd.from_arrow(_nodes(nodes)),
                         members=rd.from_arrow(_members(members)),
                         groups=rd.from_arrow(groups))
    assert sorted(r["image_id"] for r in out.take_all()) == ["11", "13"]
