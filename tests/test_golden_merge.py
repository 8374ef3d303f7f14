"""Golden parity with the reference merge suite
(/root/reference/test/merge/CMakeLists.txt): input1+input2(+input3) ->
output2/output3 (order-insensitive; duplicate objects emitted once;
DIFFERENT versions of one id both kept — node 16 v1+v2 in output3.osm),
and same-ids --with-history -> output-same-ids.osm."""

import pyarrow as pa


def _t(ids, versions, lats):
    return pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "version": pa.array(versions, type=pa.int64()),
        "lat": pa.array([float(x) for x in lats]),
    })


def _in1():
    return _t([10, 11, 13, 14, 16], [1, 1, 1, 1, 2], [1, 2, 4, 5, 8])


def _in2():
    return _t([10, 12, 15, 16], [1, 1, 1, 1], [1, 3, 6, 7])


def _in3():
    return _t([17, 18, 19], [1, 1, 1], [8, 9, 10])


def _rows(tbl_or_ds):
    df = tbl_or_ds.to_pandas().sort_values(["id", "version"]) \
        .reset_index(drop=True)
    return list(zip(df["id"], df["version"], df["lat"]))


def test_merge_golden_two_and_three_inputs(ray_session):
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import merge

    a, b, c = (rd.from_arrow(x) for x in (_in1(), _in2(), _in3()))
    expect2 = [(10, 1, 1.0), (11, 1, 2.0), (12, 1, 3.0), (13, 1, 4.0),
               (14, 1, 5.0), (15, 1, 6.0), (16, 1, 7.0), (16, 2, 8.0)]
    # i2f and i2r: same output either input order (output2.osm)
    assert _rows(merge([a, b], ["id", "version"])) == expect2
    assert _rows(merge([b, a], ["id", "version"])) == expect2
    # i3f (output3.osm)
    expect3 = expect2 + [(17, 1, 8.0), (18, 1, 9.0), (19, 1, 10.0)]
    assert _rows(merge([a, b, c], ["id", "version"])) == expect3


def test_merge_golden_same_ids_history(ray_session):
    """--with-history over a file carrying two versions of one id plus an
    empty file: both versions survive (output-same-ids.osm)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import merge

    same = rd.from_arrow(_t([10, 10], [1, 2], [1, 2]))
    empty = rd.from_arrow(_t([], [], []))
    assert _rows(merge([same, empty], ["id", "version"])) == \
        [(10, 1, 1.0), (10, 2, 2.0)]
