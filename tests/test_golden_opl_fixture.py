"""Parse the reference's own OPL fixture
(/root/reference/test/formats/f1.osm.opl) and assert the decoded values
— %-escapes (%40% = '@', %20% = space), empty tag keys/values, empty
user, high-precision coordinates, way node refs and relation member
roles. This is direct parity evidence against the reference's format
test inputs (test/formats/CMakeLists.txt round-trips)."""

from osmium_tool_ray.sources.opl import parse_opl_lines

FIXTURE = "/root/reference/test/formats/f1.osm.opl"


def _parsed():
    with open(FIXTURE) as f:
        return parse_opl_lines(f.read().splitlines())


def test_f1_nodes():
    t = _parsed()["nodes"]
    assert t.num_rows == 4
    rows = {r["image_id"]: r for r in t.to_pylist()}
    n10 = rows["n10"]
    assert (n10["version"], n10["changeset"], n10["uid"]) == (1, 1, 1)
    assert n10["user"] == "test" and n10["visible"] is True
    assert (n10["lon"], n10["lat"]) == (1.0, 1.0)
    assert n10["tags"] == []
    # n11: uid 0, EMPTY user, high-precision coords
    n11 = rows["n11"]
    assert n11["uid"] == 0 and n11["user"] == ""
    assert (n11["lon"], n11["lat"]) == (1.2355, 2.034523)
    assert str(n10["ts"]) == "2010-01-01 00:00:00"
    assert str(rows["n12"]["ts"]) == "2013-12-01 11:11:11"


def test_f1_way_tags_and_refs():
    p = _parsed()
    g = {r["group_id"]: r for r in p["groups"].to_pylist()}
    w20 = g["w20"]
    assert w20["kind"] == "way"
    # Tfoo=bar,=bar,xyz=,!%40%$=*#/ — empty key, empty value, escapes
    tags = [(t["key"], t["value"]) for t in w20["tags"]]
    assert tags == [("foo", "bar"), ("", "bar"), ("xyz", ""),
                    ("!@$", "*#/")]
    assert g["w21"]["tags"] == []
    m = [r for r in p["group_members"].to_pylist()
         if r["group_id"] == "w20"]
    assert [(r["seq"], r["ref"]) for r in m] == \
        [(0, "n10"), (1, "n11"), (2, "n12")]


def test_f1_relation_members_roles():
    p = _parsed()
    g = {r["group_id"]: r for r in p["groups"].to_pylist()}
    assert [(t["key"], t["value"]) for t in g["r30"]["tags"]] == \
        [("xyz", "abc")]
    m = [r for r in p["group_members"].to_pylist()
         if r["group_id"] == "r30"]
    # Mn12@,w20@some%20%way — empty role, then escaped-space role
    assert [(r["mtype"], r["ref"], r["role"]) for r in m] == \
        [("node", "n12", ""), ("way", "w20", "some way")]


def test_empty_opl_fixture_round_trip():
    """The reference's empty-file format fixture
    (test/formats/empty.osm.opl + test/formats/CMakeLists.txt round
    trips): an empty OPL stream parses to empty tables with STABLE
    schemas (the repo rule: empty Datasets must not lose schema), and
    rendering the empty node table emits zero lines."""
    from osmium_tool_ray.sources.opl import parse_opl_lines, render_opl_nodes

    lines = open("/root/reference/test/formats/empty.osm.opl").read() \
        .splitlines()
    assert lines == []
    out = parse_opl_lines(lines)
    assert set(out) == {"nodes", "groups", "group_members"}
    for name, tbl in out.items():
        assert tbl.num_rows == 0, name
        assert len(tbl.schema.names) > 0, name
    rendered = render_opl_nodes(out["nodes"])
    assert rendered.num_rows == 0
