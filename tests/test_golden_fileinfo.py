"""Golden parity with the reference fileinfo suite
(/root/reference/test/fileinfo/fi1.osm -> fi1-result.json): per-type
counts, min/max id (negative way ids!), bbox extent, first/last
timestamp, multiple_versions flag; the CRC becomes an order-insensitive
content hash (pipelines/stats.py docstring), asserted stable under row
permutation."""

import datetime as dt

import pyarrow as pa

from osmium_tool_ray.pipelines.stats import fileinfo


def _ts(h):
    return dt.datetime(2015, 1, 1, h, 0, 0)


def _nodes():
    # fi1.osm nodes: ids 1,2,4 / ts 01:00,02:00,04:00 / lat 1,2,3 / lon 1
    return pa.table({
        "id": pa.array([1, 2, 4], type=pa.int64()),
        "version": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([_ts(1), _ts(2), _ts(4)], type=pa.timestamp("s")),
        "lon": pa.array([1.0, 1.0, 1.0]),
        "lat": pa.array([1.0, 2.0, 3.0]),
        "caption": pa.array(["a", "b", "c"]),
    })


def _ways():
    # fi1.osm ways: ids -3, -4 (negative-id handling)
    return pa.table({
        "id": pa.array([-3, -4], type=pa.int64()),
        "version": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([_ts(4), _ts(4)], type=pa.timestamp("s")),
    })


def test_fileinfo_fi1_nodes(ray_session):
    import ray.data as rd

    info = fileinfo(rd.from_arrow(_nodes()), id_col="id", ts_col="ts",
                    lon_col="lon", lat_col="lat", version_col="version")
    assert info["count"] == 3                       # data.count.nodes
    assert info["min_id"] == 1                      # data.minid.nodes
    assert info["max_id"] == 4                      # data.maxid.nodes
    # data.bbox [1.0, 1.0, 1.0, 3.0]
    assert (info["min_lon"], info["min_lat"],
            info["max_lon"], info["max_lat"]) == (1.0, 1.0, 1.0, 3.0)
    # data.timestamp.first/last
    assert info["first_ts"] == _ts(1) and info["last_ts"] == _ts(4)
    assert info["multiple_versions"] is False


def test_fileinfo_fi1_ways_negative_ids(ray_session):
    import ray.data as rd

    info = fileinfo(rd.from_arrow(_ways()), id_col="id", ts_col="ts")
    assert info["count"] == 2                       # data.count.ways
    assert info["min_id"] == -4                     # data.minid.ways
    assert info["max_id"] == -3                     # data.maxid.ways


def test_fileinfo_multiple_versions_flag(ray_session):
    """History streams set multiple_versions (command_fileinfo.cpp:143:
    consecutive equal ids in the ordered stream; here: any id with >1
    distinct version), including pairs split across different blocks."""
    import ray.data as rd

    t = pa.table({
        "id": pa.array([1, 2, 1], type=pa.int64()),
        "version": pa.array([1, 1, 2], type=pa.int64()),
    })
    # repartition so the two versions of id 1 land in different blocks
    ds = rd.from_arrow(t).repartition(3)
    info = fileinfo(ds, id_col="id", version_col="version")
    assert info["multiple_versions"] is True
    # duplicate identical (id, version) rows alone do NOT set the flag
    t2 = pa.table({
        "id": pa.array([1, 1, 2], type=pa.int64()),
        "version": pa.array([1, 1, 1], type=pa.int64()),
    })
    info2 = fileinfo(rd.from_arrow(t2).repartition(3),
                     id_col="id", version_col="version")
    assert info2["multiple_versions"] is False


def test_fileinfo_content_hash_order_insensitive(ray_session):
    """The distributed CRC substitute: same rows in any order and any
    partitioning give the same content hash (stats.py docstring)."""
    import ray.data as rd

    a = fileinfo(rd.from_arrow(_nodes()), hash_col="caption")
    perm = _nodes().take([2, 0, 1])
    b = fileinfo(rd.from_arrow(perm).repartition(2), hash_col="caption")
    assert a["content_hash"] == b["content_hash"]
    # and it detects content changes
    changed = _nodes().set_column(
        _nodes().schema.get_field_index("caption"), "caption",
        pa.array(["a", "b", "X"]))
    c = fileinfo(rd.from_arrow(changed), hash_col="caption")
    assert c["content_hash"] != a["content_hash"]
