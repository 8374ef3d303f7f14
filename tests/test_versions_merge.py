"""T4: merge / dedup / apply-changes / merge-changes --simplify /
time-filter / derive-changes / diff goldens (FIXTURES.md §T4)."""

import datetime as dt

import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.merge import (
    apply_changes, dedup_exact, derive_changes, diff_summary, merge,
    merge_changes_simplify, sort_dataset, time_filter,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def versioned(ray_session):
    import ray.data as rd

    rows = []
    # 5 ids x 3 versions; id i3 deleted (visible=False) in v3
    for i in range(5):
        for v in (1, 2, 3):
            rows.append({
                "image_id": f"i{i}", "version": v,
                "visible": not (i == 3 and v == 3),
                "ts": _ts(f"2020-0{v}-01T00:00:00"),
                "caption": f"cap {i} v{v}",
            })
    return rd.from_arrow(pa.table({
        "image_id": pa.array([r["image_id"] for r in rows]),
        "version": pa.array([r["version"] for r in rows], type=pa.int32()),
        "visible": pa.array([r["visible"] for r in rows]),
        "ts": pa.array([r["ts"] for r in rows], type=pa.timestamp("s")),
        "caption": pa.array([r["caption"] for r in rows]),
    }))


def test_merge_dedup(ray_session):
    import ray.data as rd

    a = rd.from_items([{"image_id": f"i{k}", "version": 1, "payload": k} for k in range(6)])
    b = rd.from_items([{"image_id": f"i{k}", "version": 1, "payload": k} for k in range(4, 10)])
    out = merge([a, b], ["image_id", "version"]).take_all()
    assert len(out) == 10  # overlap i4, i5 emitted once (command_merge.cpp:260)
    assert sorted(r["image_id"] for r in out) == sorted(f"i{k}" for k in range(10))


def test_dedup_exact(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"k": "a", "o": 2}, {"k": "a", "o": 1}, {"k": "b", "o": 5}])
    out = dedup_exact(ds, ["k"], order_col="o").take_all()
    assert {(r["k"], r["o"]) for r in out} == {("a", 1), ("b", 5)}


def test_sort(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"a": 3}, {"a": 1}, {"a": 2}])
    assert [r["a"] for r in sort_dataset(ds, ["a"]).take_all()] == [1, 2, 3]


def test_apply_changes_last_version_wins(ray_session):
    import ray.data as rd

    base = rd.from_items([{"image_id": "x", "version": 1, "caption": "old"},
                          {"image_id": "y", "version": 5, "caption": "keep"}])
    changes = rd.from_items([{"image_id": "x", "version": 2, "caption": "new"},
                             {"image_id": "y", "version": 4, "caption": "stale"}])
    out = {r["image_id"]: r for r in apply_changes(base, changes, ["image_id"]).take_all()}
    assert out["x"]["caption"] == "new"      # higher version from change
    assert out["y"]["caption"] == "keep"     # base version higher than change


def test_apply_changes_equal_version_change_wins(ray_session):
    import ray.data as rd

    base = rd.from_items([{"image_id": "x", "version": 3, "caption": "base"}])
    changes = rd.from_items([{"image_id": "x", "version": 3, "caption": "change"}])
    out = apply_changes(base, changes, ["image_id"]).take_all()
    assert out[0]["caption"] == "change"


def test_apply_changes_history(ray_session):
    import ray.data as rd

    base = rd.from_items([{"image_id": "x", "version": 1, "caption": "v1"}])
    changes = rd.from_items([{"image_id": "x", "version": 2, "caption": "v2"}])
    out = apply_changes(base, changes, ["image_id"], history=True).take_all()
    assert sorted(r["version"] for r in out) == [1, 2]


def test_merge_changes_simplify(ray_session):
    import ray.data as rd

    c1 = rd.from_items([{"image_id": "x", "version": 1, "caption": "a"}])
    c2 = rd.from_items([{"image_id": "x", "version": 3, "caption": "c"},
                        {"image_id": "x", "version": 2, "caption": "b"}])
    out = merge_changes_simplify([c1, c2], ["image_id"]).take_all()
    assert len(out) == 1 and out[0]["version"] == 3


def test_time_filter(versioned):
    # snapshot at 2020-02-15: version 2 of every id
    out = time_filter(versioned, _ts("2020-02-15T00:00:00"), ["image_id"]).take_all()
    assert len(out) == 5
    assert all(r["version"] == 2 for r in out)
    # snapshot at 2020-03-15: version 3, but i3's v3 is deleted -> 4 rows
    out = time_filter(versioned, _ts("2020-03-15T00:00:00"), ["image_id"]).take_all()
    assert len(out) == 4
    assert all(r["version"] == 3 for r in out)
    # before any version: empty
    out = time_filter(versioned, _ts("2019-06-01T00:00:00"), ["image_id"]).take_all()
    assert out == []


def test_derive_changes_and_diff(ray_session):
    import ray.data as rd

    old = rd.from_items([{"image_id": "a", "caption": "1"},
                         {"image_id": "b", "caption": "2"},
                         {"image_id": "c", "caption": "3"}])
    new = rd.from_items([{"image_id": "b", "caption": "2"},
                         {"image_id": "c", "caption": "3x"},
                         {"image_id": "d", "caption": "4"}])
    tagged = {r["image_id"]: r["change"]
              for r in derive_changes(old, new, ["image_id"], ["caption"]).take_all()}
    assert tagged == {"a": "deleted", "b": "same", "c": "modified", "d": "created"}
    s = diff_summary(old, new, ["image_id"], ["caption"])
    assert (s["created"], s["deleted"], s["modified"], s["same"]) == (1, 1, 1, 1)
    assert not s["identical"]
    s2 = diff_summary(old, old, ["image_id"], ["caption"])
    assert s2["identical"]


def test_argmax_rows_native_parity(ray_session):
    """The native-Max packed-order argmax must match the map_groups form
    on a versioned stream (ts + unique tiebreaker)."""
    import datetime as dt

    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import argmax_rows, argmax_rows_native

    rows = []
    for uid in range(20):
        for k in range(15):
            rows.append({"user_id": uid, "event_id": uid * 100 + k,
                         "ts": dt.datetime(2024, 1, 1 + (k * 7) % 28),
                         "value": float(uid * k)})
    ds = rd.from_items(rows)
    a = sorted((r["user_id"], r["event_id"], r["value"]) for r in
               argmax_rows(ds, ["user_id"], ["ts", "event_id"]).take_all())
    b = sorted((r["user_id"], r["event_id"], r["value"]) for r in
               argmax_rows_native(ds, ["user_id"], ["ts", "event_id"]).take_all())
    assert a == b and len(a) == 20
