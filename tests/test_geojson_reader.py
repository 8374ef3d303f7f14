"""GeoJSONSeq reader (sources/geojson): writer round trip, RFC 8142 RS
tolerance, Point-only guard."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.sources.geojson import (parse_geojsonseq_lines,
                                             read_geojsonseq)


def test_parse_lines_with_rs_and_props():
    lines = pa.array([
        '\x1e{"type":"Feature","id":"a","geometry":{"type":"Point",'
        '"coordinates":[1.5,-2.25]},"properties":{"caption":"x","n":1}}',
        '{"type":"Feature","id":"b","geometry":{"type":"Point",'
        '"coordinates":[-180,85.01]},"properties":{"caption":"y","n":2}}',
    ])
    t = parse_geojsonseq_lines(lines)
    assert t["feature_id"].to_pylist() == ["a", "b"]
    assert t["lon"].to_pylist() == [1.5, -180.0]
    assert t["lat"].to_pylist() == [-2.25, 85.01]
    assert t["caption"].to_pylist() == ["x", "y"]
    assert t["n"].to_pylist() == [1, 2]
    sub = parse_geojsonseq_lines(lines, props=["caption"])
    assert sub.schema.names == ["feature_id", "lon", "lat", "caption"]


def test_point_only_guard():
    lines = pa.array([
        '{"type":"Feature","id":"a","geometry":{"type":"LineString",'
        '"coordinates":[1,2,3,4]},"properties":{}}'])
    with pytest.raises(ValueError, match="Point"):
        parse_geojsonseq_lines(lines)


def test_writer_reader_roundtrip(ray_session):
    import ray.data as rd

    from osmium_tool_ray.pipelines.export import render_geojson_points

    rng = np.random.default_rng(2)
    n = 200
    tbl = pa.table({
        "image_id": pa.array([f"img{i:010d}" for i in range(n)]),
        "lon": pa.array(np.round(rng.uniform(-180, 180, n), 2)),
        "lat": pa.array(np.round(rng.uniform(-85, 85, n), 2)),
        "caption": pa.array([f"c {i}" for i in range(n)]),
    })
    lines = rd.from_arrow(tbl).repartition(3).map_batches(
        lambda b: render_geojson_points(b, props=["caption"]),
        batch_format="pyarrow")
    back = read_geojsonseq(lines, props=["caption"])
    got = sorted((r["feature_id"], r["lon"], r["lat"], r["caption"])
                 for r in back.take_all())
    want = sorted(zip(tbl["image_id"].to_pylist(),
                      tbl["lon"].to_pylist(), tbl["lat"].to_pylist(),
                      tbl["caption"].to_pylist()))
    assert got == want                       # floats exactly preserved
