"""Golden parity with the reference export linear/area ruleset matrix
(/root/reference/test/export/CMakeLists.txt c-* cases): way.osm — 11 open
+ 13 closed ways crossing {no tag, linestring tag, polygon tag} x
{no area tag, area=no, area=yes, area=invalid} — dispatched under every
config combination of linear_tags/area_tags in {missing, null, true,
false, [], [tag], [absent-tag]}, asserted against the way-*.txt goldens
(id sets per geometry)."""

import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.export_rules import (
    Ruleset, export_way_features, parse_rulesets,
)
from osmium_tool_ray.schema import TAGS_TYPE

# way.osm: (id, closed, tags)
WAYS = [
    (20, False, []),
    (21, False, [("barrier", "fence")]),
    (22, False, [("area", "no")]),
    (23, False, [("area", "something")]),
    (24, False, [("area", "yes")]),
    (25, False, [("area", "no"), ("barrier", "fence")]),
    (26, False, [("area", "something"), ("barrier", "fence")]),
    (27, False, [("area", "yes"), ("barrier", "fence")]),
    (28, False, [("area", "no"), ("landuse", "grass")]),
    (29, False, [("area", "something"), ("landuse", "grass")]),
    (30, False, [("area", "yes"), ("landuse", "grass")]),
    (40, True, []),
    (41, True, [("barrier", "fence")]),
    (42, True, [("landuse", "grass")]),
    (43, True, [("barrier", "fence"), ("landuse", "grass")]),
    (44, True, [("area", "no")]),
    (45, True, [("area", "something")]),
    (46, True, [("area", "yes")]),
    (47, True, [("area", "no"), ("barrier", "fence")]),
    (48, True, [("area", "something"), ("barrier", "fence")]),
    (49, True, [("area", "no"), ("landuse", "grass")]),
    (50, True, [("area", "no"), ("landuse", "grass")]),
    (51, True, [("area", "something"), ("landuse", "grass")]),
    (52, True, [("area", "yes"), ("landuse", "grass")]),
]
# fix 49: area=yes + barrier (transcription of way.osm)
WAYS[WAYS.index((49, True, [("area", "no"), ("landuse", "grass")]))] = \
    (49, True, [("area", "yes"), ("barrier", "fence")])

OPEN_LINES = [21, 22, 23, 24, 25, 26, 27, 28, 29, 30]

# (config, expected closed-way linestring ids, expected area ids, golden file)
MISSING = object()
MATRIX = [
    ({"linear_tags": [], "area_tags": []},
     [41, 42, 43, 44, 45, 47, 48, 50, 51],
     [41, 42, 43, 45, 46, 48, 49, 51, 52], "way-all.txt"),
    ({"linear_tags": None, "area_tags": None},
     [41, 42, 43, 44, 45, 47, 48, 50, 51],
     [41, 42, 43, 45, 46, 48, 49, 51, 52], "way-all.txt (null-null)"),
    ({},
     [41, 42, 43, 44, 45, 47, 48, 50, 51],
     [41, 42, 43, 45, 46, 48, 49, 51, 52], "way-all.txt (undefined)"),
    ({"linear_tags": True, "area_tags": True},
     [41, 42, 43, 44, 45, 47, 48, 50, 51],
     [41, 42, 43, 45, 46, 48, 49, 51, 52], "way-all.txt (true-true)"),
    ({"linear_tags": False, "area_tags": False},
     [44, 47, 50],
     [46, 49, 52], "way-none.txt"),
    ({"linear_tags": ["barrier"], "area_tags": []},
     [41, 43, 44, 47, 48, 50],
     [41, 42, 43, 45, 46, 48, 49, 51, 52], "way-tag-empty.txt"),
    ({"linear_tags": [], "area_tags": ["landuse"]},
     [41, 42, 43, 44, 45, 47, 48, 50, 51],
     [42, 43, 46, 49, 51, 52], "way-empty-tag.txt"),
    ({"linear_tags": ["barrier"], "area_tags": ["landuse"]},
     [41, 43, 44, 47, 48, 50],
     [42, 43, 46, 49, 51, 52], "way-tag-tag.txt"),
    ({"linear_tags": ["does-not-exist"], "area_tags": []},
     [44, 47, 50],
     [41, 42, 43, 45, 46, 48, 49, 51, 52], "way-tagx-empty.txt"),
    ({"linear_tags": [], "area_tags": ["does-not-exist"]},
     [41, 42, 43, 44, 45, 47, 48, 50, 51],
     [46, 49, 52], "way-empty-tagx.txt"),
    ({"linear_tags": ["does-not-exist"], "area_tags": ["does-not-exist"]},
     [44, 47, 50],
     [46, 49, 52], "way-tagx-tagx.txt"),
    ({"linear_tags": None, "area_tags": ["landuse"]},
     [41, 44, 45, 47, 48, 50],
     [42, 43, 46, 49, 51, 52], "way-null-tag.txt"),
    ({"linear_tags": ["barrier"], "area_tags": None},
     [41, 43, 44, 47, 48, 50],
     [42, 45, 46, 49, 51, 52], "way-tag-null.txt"),
]


def _ways_table():
    return pa.table({
        "way_id": pa.array([w[0] for w in WAYS], type=pa.int64()),
        "closed": pa.array([w[1] for w in WAYS]),
        "tags": pa.array([[{"key": k, "value": v} for k, v in w[2]]
                          for w in WAYS], type=TAGS_TYPE),
    })


def _dispatch(config, keep_untagged=False):
    import ray.data as rd

    lin, area = parse_rulesets(config)
    out = export_way_features(rd.from_arrow(_ways_table()), lin, area,
                              keep_untagged=keep_untagged)
    lines, areas = [], []
    for r in out.take_all():
        (lines if r["geom"] == "linestring" else areas).append(r["way_id"])
    return sorted(lines), sorted(areas)


@pytest.mark.parametrize("config,closed_lines,areas,golden", MATRIX,
                         ids=[m[3] for m in MATRIX])
def test_export_ruleset_matrix(ray_session, config, closed_lines, areas,
                               golden):
    got_lines, got_areas = _dispatch(config)
    assert got_lines == sorted(OPEN_LINES + closed_lines), golden
    assert got_areas == areas, golden


def test_export_keep_untagged(ray_session):
    """way-all-n.txt: -n adds the untagged open way 20 and untagged
    closed way 40 as linestrings; 40 still produces NO area."""
    got_lines, got_areas = _dispatch(
        {"linear_tags": [], "area_tags": []}, keep_untagged=True)
    assert got_lines == sorted(
        [20, 40] + OPEN_LINES + [41, 42, 43, 44, 45, 47, 48, 50, 51])
    assert got_areas == [41, 42, 43, 45, 46, 48, 49, 51, 52]


def test_parse_ruleset_errors():
    """config_error cases (command_export.cpp:97-99, 110-112)."""
    with pytest.raises(ValueError):
        Ruleset.parse("not-a-list")
    with pytest.raises(ValueError):
        Ruleset.parse([1, 2])


def test_key_value_rules(ray_session):
    """LIST rules support key=value form (initialize_tags_filter)."""
    import ray.data as rd

    lin, area = parse_rulesets(
        {"linear_tags": ["barrier=hedge"], "area_tags": False})
    out = export_way_features(rd.from_arrow(_ways_table()), lin, area)
    lines = sorted(r["way_id"] for r in out.take_all()
                   if r["geom"] == "linestring")
    # barrier=fence does NOT match barrier=hedge -> only forced area=no
    assert lines == sorted(OPEN_LINES + [44, 47, 50])
