"""Golden parity with the reference time-filter suite
(/root/reference/test/time-filter/CMakeLists.txt): input.osh run at
point timestamps ts1/ts2/ts3 + `last`, and ranges 1-2 / 2-3 / 2-3a /
2-4 / 0-5 — outputs transcribed from output-*.os[mh].

Fixture (timestamps as integer hours): node 1 versions 1-4 at hours
1,2,3,4 (v4 invisible = deleted); node 2 versions 1,2,3 at hours 1,2,2
(v2 and v3 share a timestamp — the degenerate zero-length interval the
range predicate special-cases); node 3 versions 1,3,4 at hours 1,2,3."""

import pyarrow as pa


def _history():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id": pa.array([1, 1, 1, 1, 2, 2, 2, 3, 3, 3], type=pa.int64()),
        "version": pa.array([1, 2, 3, 4, 1, 2, 3, 1, 3, 4], type=pa.int64()),
        "ts": pa.array([1, 2, 3, 4, 1, 2, 2, 1, 2, 3], type=pa.int64()),
        "visible": pa.array([True, True, True, False,
                             True, True, True, True, True, True]),
    }))


def _rows(ds):
    df = ds.to_pandas().sort_values(["id", "version"]).reset_index(drop=True)
    return list(zip(df["id"], df["version"]))


def test_point_snapshots_golden(ray_session):
    """ts1/ts2/ts3 point outputs + `last` (the reference's no-arg form:
    snapshot at now, deleted objects dropped)."""
    from osmium_tool_ray.pipelines.merge import time_filter

    h = _history()
    # ts1: all at version 1 (output-ts1.osm)
    assert _rows(time_filter(h, 1, ["id"], tiebreak_cols=["version"])) == \
        [(1, 1), (2, 1), (3, 1)]
    # ts2: node 2 at v3 (same-ts tie -> higher version), node 3 at v3
    assert _rows(time_filter(h, 2, ["id"], tiebreak_cols=["version"])) == \
        [(1, 2), (2, 3), (3, 3)]
    # ts3: node 1 at v3, others unchanged (output-ts3.osm)
    assert _rows(time_filter(h, 3, ["id"], tiebreak_cols=["version"])) == \
        [(1, 3), (2, 3), (3, 4)]
    # last: node 1's final version is a delete -> dropped (output-last.osm)
    assert _rows(time_filter(h, 99, ["id"], tiebreak_cols=["version"])) == \
        [(2, 3), (3, 4)]


def test_range_golden(ray_session):
    """The five range cases — exact row sets from output-range-*.osh."""
    from osmium_tool_ray.pipelines.merge import time_filter_range

    h = _history()

    def rng(a, b):
        return _rows(time_filter_range(h, a, b, ["id"], ts_col="ts",
                                       order_cols=["version"]))

    # range-1-2: only the version-1 rows
    assert rng(1, 2) == [(1, 1), (2, 1), (3, 1)]
    # range-2-3: v2 of node 1; BOTH same-ts versions of node 2; node 3 v3
    assert rng(2, 3) == [(1, 2), (2, 2), (2, 3), (3, 3)]
    # range-2-3a (to=3:01 -> integer hours: to=4 minus node-1-v4/node-3
    # boundary...): start < 3.01 pulls in the hour-3 versions too
    assert rng(2, 3.01) == [(1, 2), (1, 3), (2, 2), (2, 3), (3, 3), (3, 4)]
    # range-2-4
    assert rng(2, 4) == [(1, 2), (1, 3), (2, 2), (2, 3), (3, 3), (3, 4)]
    # range-0-5: everything, INCLUDING the invisible delete version
    assert rng(0, 5) == [(1, 1), (1, 2), (1, 3), (1, 4),
                         (2, 1), (2, 2), (2, 3),
                         (3, 1), (3, 3), (3, 4)]
