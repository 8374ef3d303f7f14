"""Golden parity with the reference export unique-id and escaping cases
(/root/reference/test/export/CMakeLists.txt geojsonuid / geojsoncnt /
geojsonchar): -u type_id (n14 / w20 / w21 / a61 from relation 30,
output-uid.geojsonseq), -u counter (dense 1..N, output-cnt.geojsonseq),
and JSON string escaping of quotes in tag keys/values/users
(output-chars.geojson)."""

import json

import pyarrow as pa

from osmium_tool_ray.pipelines.export import (
    add_counter_ids, add_type_id, render_geojson_points,
)


def _features():
    # the four features of output-uid.geojsonseq in source-id terms
    return pa.table({
        "kind": pa.array(["node", "way", "way", "area_relation"]),
        "id": pa.array([14, 20, 21, 30], type=pa.int64()),
    })


def test_type_id_golden(ray_session):
    out = add_type_id(_features())
    assert out["feature_id"].to_pylist() == ["n14", "w20", "w21", "a61"]
    # area from a closed way: twice the way id (way 46 -> a92)
    way_area = pa.table({"kind": pa.array(["area_way"]),
                         "id": pa.array([46], type=pa.int64())})
    assert add_type_id(way_area)["feature_id"].to_pylist() == ["a92"]
    # negative ids keep their sign ('w-12' per man/osmium-export.md)
    neg = pa.table({"kind": pa.array(["way"]),
                    "id": pa.array([-12], type=pa.int64())})
    assert add_type_id(neg)["feature_id"].to_pylist() == ["w-12"]


def test_counter_ids_golden(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_features()).repartition(3)
    out = add_counter_ids(ds, ["kind", "id"])
    rows = {(r["kind"], r["id"]): r["feature_id"] for r in out.take_all()}
    # dense 1..4, deterministic by the sort key
    assert sorted(rows.values()) == [1, 2, 3, 4]
    got = add_counter_ids(ds, ["kind", "id"]).take_all()
    again = {(r["kind"], r["id"]): r["feature_id"] for r in got}
    assert again == rows  # reproducible across runs


def test_geojson_escaping_golden(ray_session):
    """output-chars.geojson: quotes inside user names and tag values are
    escaped so every emitted line is valid JSON with the original text."""
    batch = pa.table({
        "image_id": pa.array(["n10", "n11", "n12"]),
        "lon": pa.array([1.0, 1.0, 1.0]),
        "lat": pa.array([3.0, 1.0, 2.0]),
        "user": pa.array(["te'st", 'te"st', "test"]),
    })
    out = render_geojson_points(batch, props=["user"])
    lines = out["line"].to_pylist()
    parsed = [json.loads(s) for s in lines]
    assert [p["properties"]["user"] for p in parsed] == \
        ["te'st", 'te"st', "test"]
    assert [p["geometry"]["coordinates"] for p in parsed] == \
        [[1.0, 3.0], [1.0, 1.0], [1.0, 2.0]]
