"""Golden parity with the reference apply-changes suite
(/root/reference/test/apply-changes/CMakeLists.txt:13 `data` case and
:21 `history-osh-osh` case): input-data.osm / input-history.osh +
input-change.osc -> output-data.osm / output-history.osh.

The XML fixtures are transcribed into the engine's row model (containers
are parquet/arrow by design, SURVEY §8.1): nodes carry (id, version,
lon, lat, visible); ways carry their refs as a joined string payload.
Delete rows are visible=False; a plain snapshot output drops them,
history output keeps them as invisible versions."""

import pandas as pd
import pyarrow as pa


def _nodes_base():
    return pa.table({
        "id": pa.array([10, 11, 12, 13], type=pa.int64()),
        "version": pa.array([1, 1, 1, 1], type=pa.int64()),
        "lon": pa.array([1.0, 1.0, 1.0, 1.0]),
        "lat": pa.array([1.0, 2.0, 3.0, 4.0]),
        "visible": pa.array([True] * 4),
    })


def _nodes_change():
    # modify 11 v2 (lon 2), delete 13 v2, create 14 v1 (input-change.osc)
    return pa.table({
        "id": pa.array([11, 13, 14], type=pa.int64()),
        "version": pa.array([2, 2, 1], type=pa.int64()),
        "lon": pa.array([2.0, 1.0, 1.0]),
        "lat": pa.array([2.0, 4.0, 5.0]),
        "visible": pa.array([True, False, True]),
    })


def _ways_base():
    return pa.table({
        "id": pa.array([20, 21], type=pa.int64()),
        "version": pa.array([1, 1], type=pa.int64()),
        "refs": pa.array(["10,11,12", "12,13"], type=pa.string()),
        "tag": pa.array(["foo=bar", "xyz=abc"], type=pa.string()),
        "visible": pa.array([True, True]),
    })


def _ways_change():
    return pa.table({
        "id": pa.array([21], type=pa.int64()),
        "version": pa.array([2], type=pa.int64()),
        "refs": pa.array(["12,14"], type=pa.string()),
        "tag": pa.array(["xyz=new"], type=pa.string()),
        "visible": pa.array([True]),
    })


def test_apply_changes_golden_data(ray_session):
    """`data` case -> output-data.osm: node 11 at v2 with new coords,
    node 13 gone (deleted), node 14 created, way 21 at v2 with new
    refs/tag, way 20 and relation 30 untouched."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import apply_changes

    nodes = apply_changes(rd.from_arrow(_nodes_base()),
                          rd.from_arrow(_nodes_change()), ["id"])
    snap = nodes.to_pandas()
    snap = snap[snap["visible"]].sort_values("id").reset_index(drop=True)
    assert snap["id"].tolist() == [10, 11, 12, 14]
    assert snap["version"].tolist() == [1, 2, 1, 1]
    assert snap["lon"].tolist() == [1.0, 2.0, 1.0, 1.0]
    assert snap["lat"].tolist() == [1.0, 2.0, 3.0, 5.0]

    ways = apply_changes(rd.from_arrow(_ways_base()),
                         rd.from_arrow(_ways_change()), ["id"])
    wsnap = ways.to_pandas()
    wsnap = wsnap[wsnap["visible"]].sort_values("id").reset_index(drop=True)
    assert wsnap["id"].tolist() == [20, 21]
    assert wsnap["version"].tolist() == [1, 2]
    assert wsnap["refs"].tolist() == ["10,11,12", "12,14"]
    assert wsnap["tag"].tolist() == ["foo=bar", "xyz=new"]


def test_apply_changes_golden_history(ray_session):
    """`history-osh-osh` case -> output-history.osh: every distinct
    (id, version) kept — including node 12's two base versions and the
    DELETED node 13 v2 as a visible=false row."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import apply_changes

    base = pa.table({
        "id": pa.array([10, 11, 12, 12, 13], type=pa.int64()),
        "version": pa.array([1, 1, 1, 2, 1], type=pa.int64()),
        "lon": pa.array([1.0, 1.0, 1.0, 2.0, 1.0]),
        "lat": pa.array([1.0, 2.0, 3.0, 3.0, 4.0]),
        "visible": pa.array([True] * 5),
    })
    hist = apply_changes(rd.from_arrow(base),
                         rd.from_arrow(_nodes_change()), ["id"],
                         history=True)
    out = hist.to_pandas().sort_values(["id", "version"]).reset_index(drop=True)
    got = list(zip(out["id"], out["version"], out["visible"], out["lon"]))
    assert got == [
        (10, 1, True, 1.0),
        (11, 1, True, 1.0), (11, 2, True, 2.0),
        (12, 1, True, 1.0), (12, 2, True, 2.0),
        (13, 1, True, 1.0), (13, 2, False, 1.0),
        (14, 1, True, 1.0),
    ]
