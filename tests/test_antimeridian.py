"""T3: antimeridian / polygon-edge fixtures mirroring
/root/reference/test/extract/antimeridian.opl and its golden outputs
(output-antimeridian-{east,west,both}.opl): points at lon ±180 must fall in
exactly one side; ±180 are distinct locations (no wrap of the fix coords).
Plus winding-reversal, holes, and boundary-point semantics."""

import numpy as np

from osmium_tool_ray.state.regions import Region, parse_bbox_string, parse_geojson_geometry

# antimeridian.opl nodes n10..n13 (east), n20..n23 (west)
IDS = ["n10", "n11", "n12", "n13", "n20", "n21", "n22", "n23"]
LON = np.array([170.0, 180.0, 180.0, 170.0, -170.0, -180.0, -180.0, -170.0])
LAT = np.array([66.0, 66.0, 70.0, 70.0, 66.0, 66.0, 70.0, 70.0])

EAST_RING = [[160, 60], [180, 60], [180, 80], [160, 80], [160, 60]]
WEST_RING = [[-180, 60], [-160, 60], [-160, 80], [-180, 80], [-180, 60]]


def _ids(mask):
    return [i for i, m in zip(IDS, mask) if m]


def test_east_west_bbox():
    east = Region(name="e", kind="bbox", bbox=parse_bbox_string("160,60,180,80"))
    west = Region(name="w", kind="bbox", bbox=parse_bbox_string("-180,60,-160,80"))
    assert _ids(east.contains(LON, LAT)) == ["n10", "n11", "n12", "n13"]
    assert _ids(west.contains(LON, LAT)) == ["n20", "n21", "n22", "n23"]


def test_east_west_polygon_match_bbox():
    east = Region(name="e", kind="polygon",
                  rings=parse_geojson_geometry({"type": "Polygon", "coordinates": [EAST_RING]}))
    west = Region(name="w", kind="polygon",
                  rings=parse_geojson_geometry({"type": "Polygon", "coordinates": [WEST_RING]}))
    assert _ids(east.contains(LON, LAT)) == ["n10", "n11", "n12", "n13"]
    assert _ids(west.contains(LON, LAT)) == ["n20", "n21", "n22", "n23"]


def test_both_multipolygon():
    both = Region(name="b", kind="polygon", rings=parse_geojson_geometry(
        {"type": "MultiPolygon", "coordinates": [[EAST_RING], [WEST_RING]]}))
    assert _ids(both.contains(LON, LAT)) == IDS


def test_reverse_winding_same_result():
    # polygon-russia-reverse.geojson case: wrong-wound rings normalized
    both = Region(name="b", kind="polygon", rings=parse_geojson_geometry(
        {"type": "MultiPolygon",
         "coordinates": [[EAST_RING[::-1]], [WEST_RING[::-1]]]}))
    assert _ids(both.contains(LON, LAT)) == IDS


def test_outer_inner_hole():
    # polygon-outer-inner.poly case: hole excluded, point in hole's ring
    # vertex chain still inside (endpoint rule)
    rings = parse_geojson_geometry({"type": "Polygon", "coordinates": [
        [[160, 60], [180, 60], [180, 80], [160, 80], [160, 60]],
        [[168, 64], [172, 64], [172, 68], [168, 68], [168, 64]],
    ]})
    reg = Region(name="h", kind="polygon", rings=rings)
    inside = reg.contains(np.array([170.0, 165.0, 168.0]), np.array([66.0, 66.0, 64.0]))
    assert inside.tolist() == [False, True, True]  # hole; solid; hole vertex


def test_point_exactly_on_vertex_inside():
    # extract_polygon.cpp:137-139 — segment endpoints are inside
    reg = Region(name="v", kind="polygon", rings=parse_geojson_geometry(
        {"type": "Polygon", "coordinates": [EAST_RING]}))
    assert reg.contains(np.array([160.0, 180.0]), np.array([60.0, 80.0])).all()
