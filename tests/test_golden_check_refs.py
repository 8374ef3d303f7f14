"""Golden parity with the reference check-refs suite
(/root/reference/test/check-refs/CMakeLists.txt): fail-n-in-w fails the
default node-in-way check; way-okay passes WITHOUT -r but fails WITH -r
(missing way in a relation); okay-r-in-r's mutual relation references
pass; fail-r-in-r-1 fails."""

import pyarrow as pa


def _ds(tbl):
    import ray.data as rd
    return rd.from_arrow(tbl)


def _images(ids):
    return _ds(pa.table({"image_id": pa.array(ids, type=pa.string())}))


def _groups(ids, kinds):
    return _ds(pa.table({"group_id": pa.array(ids, type=pa.string()),
                         "kind": pa.array(kinds, type=pa.string())}))


def _members(rows):
    return _ds(pa.table({
        "group_id": pa.array([r[0] for r in rows], type=pa.string()),
        "seq": pa.array(list(range(len(rows))), type=pa.int32()),
        "mtype": pa.array([r[1] for r in rows], type=pa.string()),
        "ref": pa.array([r[2] for r in rows], type=pa.string()),
    }))


def test_check_refs_fail_node_in_way(ray_session):
    from osmium_tool_ray.pipelines.idops import check_refs

    res = check_refs(_images(["n10", "n11"]),
                     _members([("w20", "node", "n10"),
                               ("w20", "node", "n12")]),
                     groups=_groups(["w20"], ["way"]))
    assert res["nodes_in_ways"] == 1


def test_check_refs_way_okay_vs_r(ray_session):
    """way-okay.osm: all way->node refs exist (default passes); the
    relation's way member 21 does not (so -r fails)."""
    from osmium_tool_ray.pipelines.idops import check_refs

    images = _images(["n10", "n11", "n12"])
    members = _members([("w20", "node", "n10"), ("w20", "node", "n12"),
                        ("w20", "node", "n11"),
                        ("r30", "node", "n10"), ("r30", "way", "w21")])
    groups = _groups(["w20", "r30"], ["way", "relation"])
    res = check_refs(images, members, groups=groups, check_relations=True)
    assert res["nodes_in_ways"] == 0
    assert res["nodes_in_relations"] == 0
    assert res["ways_in_relations"] == 1


def test_check_refs_relations_cycle(ray_session):
    """okay-r-in-r.osm: mutually-referencing relations both exist -> 0
    missing; fail-r-in-r-1.osm: the target relation is absent -> 1."""
    from osmium_tool_ray.pipelines.idops import check_refs

    ok = check_refs(_images([]),
                    _members([("r30", "relation", "r31"),
                              ("r31", "relation", "r30")]),
                    groups=_groups(["r30", "r31"],
                                   ["relation", "relation"]),
                    check_relations=True)
    assert ok["relations_in_relations"] == 0

    fail = check_refs(_images([]),
                      _members([("r30", "relation", "r31")]),
                      groups=_groups(["r30"], ["relation"]),
                      check_relations=True)
    assert fail["relations_in_relations"] == 1
