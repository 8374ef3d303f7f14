"""Golden parity for the export `-f text` WKT renderers
(/root/reference/test/export/way-all.txt, way-all-n.txt): point lines
`POINT(x y) @id=..`, way lines `LINESTRING(x y,...) @id=..,k=v`, and the
closed-ring `MULTIPOLYGON(((...)))` with CCW outer-ring normalization
(reference output ring (1 1,2 1,2 2,1 2,1 1) from the CW input way)."""

import pyarrow as pa

from osmium_tool_ray.pipelines.export import (
    render_text_points, render_wkt_ways,
)
from osmium_tool_ray.schema import TAGS_TYPE

# way.osm node coords: 10=(1,1) 11=(1,2) 12=(2,2) 13=(2,1)
LOCS = {"10": (1.0, 1.0), "11": (1.0, 2.0),
        "12": (2.0, 2.0), "13": (2.0, 1.0)}


def _members(way_id, refs):
    return pa.table({
        "group_id": pa.array([way_id] * len(refs)),
        "seq": pa.array(range(len(refs)), type=pa.int32()),
        "lon": pa.array([LOCS[r][0] for r in refs]),
        "lat": pa.array([LOCS[r][1] for r in refs]),
    })


def test_text_points_golden(ray_session):
    """way-all-n.txt point lines: POINT(1 1) @id=10 ... POINT(2 1) @id=13
    (trailing-zero-free coords)."""
    batch = pa.table({
        "image_id": pa.array(["10", "11", "12", "13"]),
        "lon": pa.array([1.0, 1.0, 2.0, 2.0]),
        "lat": pa.array([1.0, 2.0, 2.0, 1.0]),
    })
    lines = render_text_points(batch)["line"].to_pylist()
    assert lines == ["POINT(1 1) @id=10", "POINT(1 2) @id=11",
                     "POINT(2 2) @id=12", "POINT(2 1) @id=13"]


def test_text_points_with_tags(ray_session):
    """Tags render as sorted ,k=v suffixes (output-cnt.geojsonseq point
    properties amenity=post_box)."""
    batch = pa.table({
        "image_id": pa.array(["14", "15"]),
        "lon": pa.array([2.0, 3.0]),
        "lat": pa.array([1.5, 4.0]),
        "tags": pa.array([[{"key": "name", "value": "x"},
                           {"key": "amenity", "value": "post_box"}],
                          []], type=TAGS_TYPE),
    })
    lines = render_text_points(batch, tags_col="tags")["line"].to_pylist()
    assert lines == ["POINT(2 1.5) @id=14,amenity=post_box,name=x",
                     "POINT(3 4) @id=15"]


def test_wkt_way_linestring_golden(ray_session):
    """way-all.txt: LINESTRING(1 1,1 2,2 2) @id=21,barrier=fence."""
    import ray.data as rd

    ds = rd.from_arrow(_members("21", ["10", "11", "12"]))
    out = render_wkt_ways(ds, tags_by_way={"21": "barrier=fence"})
    assert out.take_all()[0]["line"] == \
        "LINESTRING(1 1,1 2,2 2) @id=21,barrier=fence"


def test_wkt_closed_way_multipolygon_golden(ray_session):
    """way-all.txt: the CW closed way 41 renders as
    MULTIPOLYGON(((1 1,2 1,2 2,1 2,1 1))) — outer ring CCW-normalized."""
    import ray.data as rd

    ds = rd.from_arrow(_members("41", ["10", "11", "12", "13", "10"]))
    out = render_wkt_ways(ds, tags_by_way={"41": "barrier=fence"},
                          closed_as_polygon=True)
    assert out.take_all()[0]["line"] == \
        "MULTIPOLYGON(((1 1,2 1,2 2,1 2,1 1))) @id=41,barrier=fence"
    # the same members WITHOUT closed_as_polygon render the linestring
    out2 = render_wkt_ways(ds, tags_by_way={"41": "barrier=fence"})
    assert out2.take_all()[0]["line"] == \
        "LINESTRING(1 1,1 2,2 2,2 1,1 1) @id=41,barrier=fence"
