"""Golden parity for derive-changes full output records
(/root/reference/test/derive-changes/output.osc, output-keep-details.osc,
output-incr-version.osc): created/modified rows carry new-side payload,
deleted rows are payload-stripped by default, --keep-details keeps the
old payload, --increment-version bumps the deleted version."""

import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.merge import derive_change_records

_T = {"node": 0, "way": 1, "relation": 2}


def _t(rows):
    return pa.table({
        "type": pa.array([r[0] for r in rows]),
        "id": pa.array([r[1] for r in rows], type=pa.int64()),
        "version": pa.array([r[2] for r in rows], type=pa.int64()),
        "payload": pa.array([r[3] for r in rows], type=pa.string()),
    })


def _input1():
    # derive-changes/input1.osm
    return _t([("node", 10, 1, "lat1"), ("node", 11, 1, "lat2"),
               ("node", 12, 1, "lat3"), ("node", 13, 1, "lat4:foo=bar"),
               ("way", 20, 1, "foo=bar"), ("way", 21, 1, "xyz=abc"),
               ("relation", 30, 1, "m")])


def _input2():
    # derive-changes/input2.osm
    return _t([("node", 10, 1, "lat1"), ("node", 11, 2, "lat2lon2"),
               ("node", 12, 1, "lat3"), ("node", 14, 1, "lat5"),
               ("way", 20, 1, "foo=bar"), ("way", 21, 2, "xyz=new"),
               ("relation", 30, 1, "m")])


def _run(**kw):
    import ray.data as rd

    out = derive_change_records(
        rd.from_arrow(_input1()), rd.from_arrow(_input2()),
        ["type", "id"], ["version", "payload"],
        version_col="version", **kw)
    rows = [(r["type"], r["id"], r["version"], r["payload"], r["change"])
            for r in out.take_all()]
    return sorted(rows, key=lambda r: (_T[r[0]], r[1]))


def test_derive_records_normal(ray_session):
    """output.osc: deleted node 13 appears in reduced form (no payload)."""
    assert _run() == [
        ("node", 11, 2, "lat2lon2", "modified"),
        ("node", 13, 1, None, "deleted"),
        ("node", 14, 1, "lat5", "created"),
        ("way", 21, 2, "xyz=new", "modified"),
    ]


def test_derive_records_keep_details(ray_session):
    """output-keep-details.osc: the delete keeps lat/tags."""
    rows = _run(keep_details=True)
    assert ("node", 13, 1, "lat4:foo=bar", "deleted") in rows
    assert len(rows) == 4


def test_derive_records_increment_version(ray_session):
    """output-incr-version.osc: deleted node 13 reports version 2."""
    rows = _run(increment_version=True)
    assert ("node", 13, 2, None, "deleted") in rows
    assert ("node", 11, 2, "lat2lon2", "modified") in rows
    assert len(rows) == 4


def test_derive_records_no_changes(ray_session):
    import ray.data as rd

    out = derive_change_records(
        rd.from_arrow(_input1()), rd.from_arrow(_input1()),
        ["type", "id"], ["version", "payload"], version_col="version")
    assert out.count() == 0
