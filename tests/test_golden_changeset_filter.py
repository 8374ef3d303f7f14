"""Golden parity with the reference changeset-filter suite
(/root/reference/test/changeset-filter/CMakeLists.txt): the complete
check_changeset_filter matrix — discussion/changes/open/closed/user/uid
flags, the 15-step --after and --before timestamp boundary sweeps over
input1.osm, the open-changeset sweeps over input-open.osm, and the two
bbox-overlap cases. Expected sets transcribed from output1-all/-first/
-second, output-open and output-empty."""

import datetime as dt

import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.changesets import changeset_filter

CS1, CS2, CSO = 15449957, 15449958, 15450185


def _ts(h, m, s):
    return dt.datetime(2013, 3, 22, h, m, s)


def _input1():
    # /root/reference/test/changeset-filter/input1.osm
    return pa.table({
        "id": pa.array([CS1, CS2], type=pa.int64()),
        "created_at": pa.array([_ts(2, 8, 55), _ts(2, 9, 11)],
                               type=pa.timestamp("s")),
        "closed_at": pa.array([_ts(2, 8, 58), _ts(3, 9, 11)],
                              type=pa.timestamp("s")),
        "num_changes": pa.array([10, 0], type=pa.int64()),
        "num_comments": pa.array([0, 0], type=pa.int64()),
        "uid": pa.array([1237205, 1233268], type=pa.int64()),
        "user": pa.array(["Elbert", "sree dinesh"]),
        "min_lon": pa.array([120.2988730, None]),
        "min_lat": pa.array([-10.0004425, None]),
        "max_lon": pa.array([120.2991740, None]),
        "max_lat": pa.array([-10.0002384, None]),
    })


def _input_open():
    # input-open.osm: still-open changeset (closed_at unset)
    return pa.table({
        "id": pa.array([CSO], type=pa.int64()),
        "created_at": pa.array([_ts(4, 20, 25)], type=pa.timestamp("s")),
        "closed_at": pa.array([None], type=pa.timestamp("s")),
        "num_changes": pa.array([0], type=pa.int64()),
        "num_comments": pa.array([0], type=pa.int64()),
        "uid": pa.array([51196], type=pa.int64()),
        "user": pa.array(["garl"]),
        "min_lon": pa.array([None], type=pa.float64()),
        "min_lat": pa.array([None], type=pa.float64()),
        "max_lon": pa.array([None], type=pa.float64()),
        "max_lat": pa.array([None], type=pa.float64()),
    })


def _run(tbl, **flags):
    import ray.data as rd

    out = changeset_filter(rd.from_arrow(tbl), **flags)
    return sorted(r["id"] for r in out.take_all())


ALL, FIRST, SECOND, EMPTY, OPEN = \
    [CS1, CS2], [CS1], [CS2], [], [CSO]

FLAG_CASES = [  # (flags, expected) over input1.osm
    ({}, ALL),                                   # cf1-no-option
    ({"with_discussion": True}, EMPTY),          # cf1-with-discussion
    ({"without_discussion": True}, ALL),         # cf1-without-discussion
    ({"with_changes": True}, FIRST),             # cf1-with-changes
    ({"without_changes": True}, SECOND),         # cf1-without-changes
    ({"open": True}, EMPTY),                     # cf1-open
    ({"closed": True}, ALL),                     # cf1-closed
    ({"user": "Elbert"}, FIRST),                 # cf1-user
    ({"uid": 1233268}, SECOND),                  # cf1-uid
    ({"bbox": (120, -11, 121, -10)}, FIRST),     # cf1-bbox01
    ({"bbox": (130, -31, 131, -30)}, EMPTY),     # cf1-bbox02
]


@pytest.mark.parametrize("flags,expected", FLAG_CASES)
def test_changeset_filter_flags(ray_session, flags, expected):
    assert _run(_input1(), **flags) == expected


AFTER_CASES = [  # cf1-after01..15: --after=T; open-or-closed_at>=T
    (_ts(2, 8, 50), ALL), (_ts(2, 8, 54), ALL), (_ts(2, 8, 55), ALL),
    (_ts(2, 8, 56), ALL), (_ts(2, 8, 57), ALL), (_ts(2, 8, 58), ALL),
    (_ts(2, 8, 59), SECOND), (_ts(2, 9, 0), SECOND), (_ts(2, 9, 10), SECOND),
    (_ts(2, 9, 11), SECOND), (_ts(2, 9, 12), SECOND), (_ts(3, 9, 10), SECOND),
    (_ts(3, 9, 11), SECOND), (_ts(3, 9, 12), EMPTY), (_ts(3, 9, 20), EMPTY),
]


@pytest.mark.parametrize("t,expected", AFTER_CASES)
def test_changeset_filter_after_sweep(ray_session, t, expected):
    assert _run(_input1(), after=t) == expected


BEFORE_CASES = [  # cf1-before01..15: --before=T; created_at<=T
    (_ts(2, 8, 50), EMPTY), (_ts(2, 8, 54), EMPTY), (_ts(2, 8, 55), FIRST),
    (_ts(2, 8, 56), FIRST), (_ts(2, 8, 57), FIRST), (_ts(2, 8, 58), FIRST),
    (_ts(2, 8, 59), FIRST), (_ts(2, 9, 0), FIRST), (_ts(2, 9, 10), FIRST),
    (_ts(2, 9, 11), ALL), (_ts(2, 9, 12), ALL), (_ts(3, 9, 10), ALL),
    (_ts(3, 9, 11), ALL), (_ts(3, 9, 12), ALL), (_ts(3, 9, 20), ALL),
]


@pytest.mark.parametrize("t,expected", BEFORE_CASES)
def test_changeset_filter_before_sweep(ray_session, t, expected):
    assert _run(_input1(), before=t) == expected


def test_changeset_filter_open_fixture(ray_session):
    """cfe-*: the still-open changeset passes --open and every --after
    (changeset_after returns true for open changesets), fails --closed."""
    assert _run(_input_open(), open=True) == OPEN      # cfe-open
    assert _run(_input_open(), closed=True) == EMPTY   # cfe-closed
    for t in (_ts(4, 20, 24), _ts(4, 20, 25), _ts(4, 20, 26)):
        assert _run(_input_open(), after=t) == OPEN    # cfe-after01..03
    # cfe-before01..03: created_at 04:20:25 <= T
    assert _run(_input_open(), before=_ts(4, 20, 24)) == EMPTY
    assert _run(_input_open(), before=_ts(4, 20, 25)) == OPEN
    assert _run(_input_open(), before=_ts(4, 20, 26)) == OPEN


def test_changeset_filter_conjunction(ray_session):
    """Flags AND together (the reference's single copy_if lambda)."""
    assert _run(_input1(), closed=True, with_changes=True,
                user="Elbert") == FIRST
    assert _run(_input1(), with_changes=True, uid=1233268) == EMPTY
