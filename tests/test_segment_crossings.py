"""Segment-intersection join (stages/spatial.track_segments +
segment_crossings) vs a DuckDB orientation-CASE oracle and hand
fixtures for the strict "proper crossing" semantics."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.spatial import segment_crossings, track_segments

_ORACLE = """
    WITH seg AS (SELECT user_id, x1, y1, x2, y2 FROM segs),
    d AS (SELECT sa.user_id AS a, sb.user_id AS b,
           (sb.x2-sb.x1)*(sa.y1-sb.y1) - (sa.x1-sb.x1)*(sb.y2-sb.y1) AS d1,
           (sb.x2-sb.x1)*(sa.y2-sb.y1) - (sa.x2-sb.x1)*(sb.y2-sb.y1) AS d2,
           (sa.x2-sa.x1)*(sb.y1-sa.y1) - (sb.x1-sa.x1)*(sa.y2-sa.y1) AS d3,
           (sa.x2-sa.x1)*(sb.y2-sa.y1) - (sb.x2-sa.x1)*(sa.y2-sa.y1) AS d4
          FROM seg sa JOIN seg sb ON sa.user_id < sb.user_id)
    SELECT a, b, COUNT(*) AS n FROM d
    WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
      AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
    GROUP BY a, b"""


def _segs_table(seed=7, n=300, users=12, span=5000):
    rng = np.random.default_rng(seed)
    return pa.table({
        "user_id": pa.array(rng.integers(1, users + 1, n),
                            type=pa.int64()),
        "x1": pa.array(rng.integers(-span, span, n), type=pa.int64()),
        "y1": pa.array(rng.integers(-span, span, n), type=pa.int64()),
        "x2": pa.array(rng.integers(-span, span, n), type=pa.int64()),
        "y2": pa.array(rng.integers(-span, span, n), type=pa.int64()),
    })


def test_crossings_vs_duckdb(ray_session):
    import ray.data as rd

    segs = _segs_table()
    out = segment_crossings(rd.from_arrow(segs).repartition(5),
                            "user_id", cell=1500)
    mine = {(r["a"], r["b"]): r["n_crossings"] for r in out.take_all()}
    oracle = {(a, b): n
              for a, b, n in duckdb.sql(_ORACLE).fetchall()}
    assert mine == oracle


def test_crossings_cell_size_invariant(ray_session):
    import ray.data as rd

    segs = _segs_table(seed=11, n=150, users=6)
    outs = []
    for cell in (400, 3000, 50000):
        out = segment_crossings(rd.from_arrow(segs), "user_id",
                                cell=cell)
        outs.append(sorted((r["a"], r["b"], r["n_crossings"])
                           for r in out.take_all()))
    assert outs[0] == outs[1] == outs[2]


def test_crossings_proper_only(ray_session):
    import ray.data as rd

    # X-cross counts; shared endpoint, T-touch, collinear overlap and
    # parallel do NOT (strict orientation semantics)
    segs = pa.table({
        "user_id": pa.array([1, 2,    3, 4,   5, 6,   7, 8,   9, 10],
                            type=pa.int64()),
        "x1": pa.array([0, 0,   100, 100,  200, 205,  300, 300,  400, 400],
                       type=pa.int64()),
        "y1": pa.array([0, 10,  0,   0,    0,   5,    0,   0,    0,   1],
                       type=pa.int64()),
        "x2": pa.array([10, 10, 110, 100,  220, 215,  320, 310,  420, 420],
                       type=pa.int64()),
        "y2": pa.array([10, 0,  10,  10,   0,   5,    0,   0,    0,   1],
                       type=pa.int64()),
    })
    # pair (1,2): proper X cross. (3,4): shared endpoint (100,0) -> no.
    # (5,6): T-touch midpoint... segment 6 horizontal at y=5 from 205..215,
    # segment 5 horizontal y=0 -> disjoint, no. (7,8): collinear overlap
    # -> no. (9,10): parallel -> no.
    out = segment_crossings(rd.from_arrow(segs), "user_id", cell=64)
    rows = {(r["a"], r["b"]): r["n_crossings"] for r in out.take_all()}
    assert rows == {(1, 2): 1}


def test_track_segments_build(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 9], type=pa.int64()),
        "ts": pa.array([t0, t0 + dt.timedelta(1), t0 + dt.timedelta(2),
                        t0], type=pa.timestamp("us")),
        "x": pa.array([0, 3, 5, 9], type=pa.int64()),
        "y": pa.array([0, 4, 6, 9], type=pa.int64()),
    })
    segs = track_segments(rd.from_arrow(tbl), "user_id", "ts", "x", "y",
                          tie_col="event_id")
    rows = sorted((r["user_id"], r["x1"], r["y1"], r["x2"], r["y2"])
                  for r in segs.take_all())
    assert rows == [(7, 0, 0, 3, 4), (7, 3, 4, 5, 6)]
