"""Golden parity with the reference getid suite
(/root/reference/test/getid/CMakeLists.txt): the full check_getid_r matrix
over source.osm / source-no-rr.osm (out10/out21/out30/out31/out32), the
plain `n11,n12 w21` case (output.osm), the idfile form with comments and
trailing tokens (output-file.osm), the missing-id failure cases
(in19/in29/in39 -> out-empty.osm + exit 1), and the cyclic relloop fixture
(relloop-out.osm). Ids arrive both as parsed token lists (-i file form,
src/id_file.cpp:31-50) and as id-osm-file datasets (-I form,
command_getid.cpp id sources)."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.idops import (
    getid, ids_from_dataset, parse_id_list,
)

# source.osm topology (/root/reference/test/getid/source.osm)
SRC_NODES = {"n10": 1.0, "n11": 2.0, "n12": 3.0, "n13": 4.0}  # id -> lat
SRC_GROUPS = [("w20", "way"), ("w21", "way"), ("w22", "way"),
              ("r30", "relation"), ("r31", "relation"), ("r32", "relation")]
SRC_MEMBERS = [
    ("w20", 0, "node", "n10"), ("w20", 1, "node", "n11"),
    ("w21", 0, "node", "n12"), ("w21", 1, "node", "n11"),
    ("w22", 0, "node", "n12"), ("w22", 1, "node", "n13"),
    ("r30", 0, "node", "n10"), ("r30", 1, "way", "w21"),
    ("r30", 2, "way", "w20"),
    ("r31", 0, "relation", "r30"),
    ("r32", 0, "node", "n13"),
]


def _datasets(ray_session, drop_r31=False):
    import ray.data as rd

    images = rd.from_arrow(pa.table({
        "image_id": pa.array(list(SRC_NODES)),
        "lat": pa.array(list(SRC_NODES.values())),
        "lon": pa.array([1.0] * len(SRC_NODES)),
        "caption": pa.array([f"cap {k}" for k in SRC_NODES]),
    }))
    groups = [g for g in SRC_GROUPS if not (drop_r31 and g[0] == "r31")]
    members = [m for m in SRC_MEMBERS if not (drop_r31 and m[0] == "r31")]
    gds = rd.from_arrow(pa.table({
        "group_id": pa.array([g[0] for g in groups]),
        "kind": pa.array([g[1] for g in groups]),
    }))
    mds = rd.from_arrow(pa.table({
        "group_id": pa.array([m[0] for m in members]),
        "seq": pa.array([m[1] for m in members], type=pa.int32()),
        "mtype": pa.array([m[2] for m in members]),
        "ref": pa.array([m[3] for m in members]),
    }))
    return images, gds, mds


def _result_ids(res):
    nodes = sorted(r["image_id"] for r in res["images_out"].take_all())
    grp = sorted(res["group_rows"]["group_id"].to_pylist())
    return nodes, grp


# (requested tokens, expected node ids, expected group ids) — transcribed
# from out10/out21/out30/out31/out32 in /root/reference/test/getid/
R_MATRIX = [
    (["n10"], ["n10"], []),                                          # out10
    (["w21"], ["n11", "n12"], ["w21"]),                              # out21
    (["r30"], ["n10", "n11", "n12"], ["r30", "w20", "w21"]),         # out30
    (["r31"], ["n10", "n11", "n12"], ["r30", "r31", "w20", "w21"]),  # out31
    (["r32"], ["n13"], ["r32"]),                                     # out32
]


@pytest.mark.parametrize("tokens,exp_nodes,exp_groups", R_MATRIX)
def test_getid_r_matrix(ray_session, tokens, exp_nodes, exp_groups):
    images, groups, members = _datasets(ray_session)
    res = getid(images, parse_id_list(tokens), groups=groups,
                members=members, recursive=True)
    nodes, grp = _result_ids(res)
    assert nodes == exp_nodes
    assert grp == exp_groups


@pytest.mark.parametrize("tokens,exp_nodes,exp_groups",
                         [R_MATRIX[0], R_MATRIX[1], R_MATRIX[2], R_MATRIX[4]])
def test_getid_r_matrix_no_rr_source(ray_session, tokens, exp_nodes,
                                     exp_groups):
    """check_getid_r(*nrr …): same outputs over source-no-rr.osm (the
    source without relation 31)."""
    images, groups, members = _datasets(ray_session, drop_r31=True)
    res = getid(images, parse_id_list(tokens), groups=groups,
                members=members, recursive=True)
    nodes, grp = _result_ids(res)
    assert nodes == exp_nodes
    assert grp == exp_groups


def test_getid_plain_output_osm(ray_session):
    """check_getid(n …): `getid source n11,n12 w21` -> output.osm
    = n11, n12, w21 (no recursion: w21's nodes NOT pulled in beyond the
    requested ones)."""
    images, groups, members = _datasets(ray_session)
    res = getid(images, parse_id_list(["n11", "n12", "w21"]),
                groups=groups, members=members)
    nodes, grp = _result_ids(res)
    assert nodes == ["n11", "n12"]
    assert grp == ["w21"]


def test_getid_idfile_output_file_osm(ray_session):
    """check_getid_file(file1 idfile …) -> output-file.osm: the idfile
    carries blank lines, '# comment' lines, leading whitespace and a
    trailing token ('n12 foo') — id_file.cpp:31-50 parsing."""
    idfile_lines = ["n11", "", "    ", "n12 foo", " n10", "  n13",
                    "# comment", "  # comment  ", "w21   "]
    ids = parse_id_list(idfile_lines)
    assert sorted(ids["node"].tolist()) == ["n10", "n11", "n12", "n13"]
    assert ids["way"].tolist() == ["w21"]
    images, groups, members = _datasets(ray_session)
    res = getid(images, ids, groups=groups, members=members)
    nodes, grp = _result_ids(res)
    assert nodes == ["n10", "n11", "n12", "n13"]  # output-file.osm
    assert grp == ["w21"]


def test_getid_id_osm_file_form(ray_session):
    """-I id-osm-file form (check_getid_r uses both -i and -I for every
    case): the requested node set read from a dataset must give the same
    out10 result as the token list."""
    import ray.data as rd

    images, groups, members = _datasets(ray_session)
    idsrc = rd.from_items([{"image_id": "n10"}])
    ids = {"node": ids_from_dataset(idsrc)}
    res = getid(images, ids, groups=groups, members=members, recursive=True)
    nodes, grp = _result_ids(res)
    assert nodes == ["n10"] and grp == []


def test_getid_missing_ids_fail(ray_session):
    """check_getid_r_fail(missing-*): requesting n19/w29/r39 over source
    yields out-empty.osm and exit code 1 — here: empty output, found_all
    False, every requested id reported missing."""
    images, groups, members = _datasets(ray_session)
    res = getid(images, parse_id_list(["n19", "w29", "r39"]), groups=groups,
                members=members, recursive=True, track_missing=True)
    assert res["images_out"].count() == 0
    assert not res["found_all"]
    assert res["missing"]["node"].tolist() == ["n19"]
    assert res["missing"]["way"].tolist() == ["w29"]
    assert res["missing"]["relation"].tolist() == ["r39"]


def test_getid_found_all_ok(ray_session):
    """Exit code 0 counterpart: every requested id present."""
    images, groups, members = _datasets(ray_session)
    res = getid(images, parse_id_list(["n10", "w21", "r30"]), groups=groups,
                members=members, recursive=True, track_missing=True)
    assert res["found_all"]
    assert all(len(v) == 0 for v in res["missing"].values())


def test_getid_relloop_golden(ray_session):
    """relloop.osm: r30 <-> r31 member cycle, both ids requested
    (relloop.id) -> relloop-out.osm keeps both, recursion terminates."""
    import ray.data as rd

    images = rd.from_arrow(pa.table({
        "image_id": pa.array([], type=pa.string()),
        "lat": pa.array([], type=pa.float64()),
    }))
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array(["r30", "r31"]),
        "kind": pa.array(["relation", "relation"]),
    }))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array(["r30", "r31"]),
        "seq": pa.array([0, 0], type=pa.int32()),
        "mtype": pa.array(["relation", "relation"]),
        "ref": pa.array(["r31", "r30"]),
    }))
    res = getid(images, parse_id_list(["r30", "r31"]), groups=groups,
                members=members, recursive=True)
    grp = res["group_rows"]
    assert sorted(grp["group_id"].to_pylist()) == ["r30", "r31"]
    # both requested explicitly -> neither is referenced_only
    assert not any(grp["referenced_only"].to_pylist())
