import json

import numpy as np
import pytest

from osmium_tool_ray.state.regions import (
    ConfigError, Region, parse_bbox_string, parse_bbox_value,
    parse_extract_config, parse_geojson_geometry, parse_poly_file,
)


def test_bbox_array_order_normalized():
    # osmium::Box::extend semantics: corner order free
    assert parse_bbox_value([1.5, 10, 0, 0]) == (0.0, 0.0, 1.5, 10.0)
    assert parse_bbox_value([0, 0, 1.5, 10]) == (0.0, 0.0, 1.5, 10.0)


def test_bbox_object_strict():
    assert parse_bbox_value({"left": 0, "right": 1, "bottom": 2, "top": 3}) == (0, 2, 1, 3)
    with pytest.raises(ConfigError):
        parse_bbox_value({"left": 1, "right": 0, "bottom": 2, "top": 3})
    with pytest.raises(ConfigError):
        parse_bbox_value({"left": 0, "right": 1, "bottom": 2})


def test_bbox_range_checked():
    with pytest.raises(ConfigError):
        parse_bbox_value([-181, 0, 0, 0])
    with pytest.raises(ConfigError):
        parse_bbox_value([0, 0, 0, 91])
    with pytest.raises(ConfigError):
        parse_bbox_value([0, 0, 0])


def test_bbox_string():
    assert parse_bbox_string("1.5,10,0,0") == (0.0, 0.0, 1.5, 10.0)
    with pytest.raises(ConfigError):
        parse_bbox_string("1,2,3")


def test_geojson_ring_normalization():
    cw_outer = [[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]]  # CW — must be reversed
    rings = parse_geojson_geometry({"type": "Polygon", "coordinates": [cw_outer]})
    from osmium_tool_ray.functions.geometry import is_ccw
    assert is_ccw(rings[0])
    reg = Region(name="x", kind="polygon", rings=rings)
    assert reg.contains(np.array([5.0]), np.array([5.0]))[0]


def test_geojson_feature_forms():
    poly = {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}
    for wrap in (poly,
                 {"type": "Feature", "geometry": poly},
                 {"type": "FeatureCollection", "features": [{"type": "Feature", "geometry": poly}]},
                 {"type": "MultiPolygon", "coordinates": [poly["coordinates"]]}):
        rings = parse_geojson_geometry(wrap)
        assert len(rings) >= 1


def test_geojson_errors():
    with pytest.raises(ConfigError):
        parse_geojson_geometry({"type": "Polygon", "coordinates": [[[0, 0], [1, 1]]]})
    with pytest.raises(ConfigError):
        parse_geojson_geometry({"type": "Polygon", "coordinates": [[[200, 0], [1, 1], [2, 2]]]})
    with pytest.raises(ConfigError):
        parse_geojson_geometry({"type": "LineString", "coordinates": []})


def test_poly_file(tmp_path):
    p = tmp_path / "region.poly"
    p.write_text("test\narea\n0 0\n10 0\n10 10\n0 10\nEND\n!hole\n4 4\n6 4\n6 6\n4 6\nEND\nEND\n")
    rings = parse_poly_file(str(p))
    assert len(rings) == 2
    reg = Region(name="t", kind="polygon", rings=rings)
    assert reg.contains(np.array([2.0]), np.array([2.0]))[0]
    assert not reg.contains(np.array([5.0]), np.array([5.0]))[0]  # in the hole


def test_poly_file_missing_end(tmp_path):
    p = tmp_path / "bad.poly"
    p.write_text("test\narea\n0 0\n10 0\n10 10\n")  # missing ENDs
    with pytest.raises(ConfigError):
        parse_poly_file(str(p))


def test_extract_config(tmp_path):
    cfg = {"extracts": [
        {"output": "a", "bbox": [0, 0, 1.5, 10]},
        {"output": "b", "polygon": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]},
        {"output": "c", "multipolygon": [[[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                                         [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]]]},
    ]}
    regions = parse_extract_config(cfg)
    assert [r.name for r in regions] == ["a", "b", "c"]
    assert regions[0].kind == "bbox"
    assert len(regions[2].rings) == 2


def test_extract_config_errors():
    with pytest.raises(ConfigError):
        parse_extract_config({"no_extracts": []})
    with pytest.raises(ConfigError):
        parse_extract_config({"extracts": [{"output": "x"}]})
    with pytest.raises(ConfigError):
        parse_extract_config({"extracts": [{"output": "x", "bbox": [0, 0, 1, 1],
                                            "polygon": []}]})
    with pytest.raises(ConfigError):
        parse_extract_config({"extracts": [{"bbox": [0, 0, 1, 1]}]})
    too_many = {"extracts": [{"output": str(i), "bbox": [0, 0, 1, 1]} for i in range(501)]}
    with pytest.raises(ConfigError):
        parse_extract_config(too_many)


def test_config_file_with_poly(tmp_path):
    poly = tmp_path / "r.poly"
    poly.write_text("r\n1\n0 0\n2 0\n2 2\n0 2\nEND\nEND\n")
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"extracts": [
        {"output": "p", "polygon": {"file_name": "r.poly"}}]}))
    regions = parse_extract_config(str(cfg))
    assert regions[0].kind == "polygon"
    assert regions[0].contains(np.array([1.0]), np.array([1.0]))[0]
