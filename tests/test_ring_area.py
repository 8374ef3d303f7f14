"""Per-key shoelace ring area (pipelines/windows.ring_area_per_key) vs
the DuckDB LEAD/FIRST_VALUE wraparound oracle, plus hand fixtures."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import ring_area_per_key


def _pts(seed=23, n=400, users=9):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 86400, n)]
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(1, users + 1, n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "xq": pa.array(rng.integers(-20000, 20000, n), type=pa.int64()),
        "yq": pa.array(rng.integers(-9000, 9000, n), type=pa.int64()),
    })


def test_ring_area_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _pts()
    out = ring_area_per_key(rd.from_arrow(tbl).repartition(6), "user_id",
                            "ts", "xq", "yq", tie_col="event_id")
    mine = {r["user_id"]: (r["n_points"], r["area2"])
            for r in out.take_all()}
    oracle = duckdb.sql("""
        WITH s AS (SELECT user_id,
               xq * COALESCE(lead(yq) OVER w, FIRST_VALUE(yq) OVER w)
             - COALESCE(lead(xq) OVER w, FIRST_VALUE(xq) OVER w) * yq AS cr
             FROM tbl WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts, event_id))
        SELECT user_id, COUNT(*) AS n, SUM(cr) AS a2
        FROM s GROUP BY user_id""").fetchall()
    assert mine == {u: (n, a2) for u, n, a2 in oracle}


def test_ring_area_hand_fixtures(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    # user 7: CCW unit square (area 1 -> area2 = +2); user 9: the same
    # square traversed CW (area2 = -2); user 4: a single point (0);
    # user 5: two points (degenerate ring, 0).
    tbl = pa.table({
        "event_id": pa.array(list(range(12)), type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 9, 9, 9, 9, 4, 5, 5, 7],
                            type=pa.int64()),
        "ts": pa.array([t0 + dt.timedelta(seconds=s)
                        for s in [0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 1, 4]],
                       type=pa.timestamp("us")),
        "xq": pa.array([0, 1, 1, 0, 0, 0, 1, 1, 5, 2, 8, 0],
                       type=pa.int64()),
        "yq": pa.array([0, 0, 1, 1, 0, 1, 1, 0, 5, 3, 9, 0],
                       type=pa.int64()),
    })
    out = ring_area_per_key(rd.from_arrow(tbl), "user_id", "ts",
                            "xq", "yq", tie_col="event_id")
    rows = {r["user_id"]: (r["n_points"], r["area2"])
            for r in out.take_all()}
    # user 7's 5th point repeats the start, so the closure edge is
    # degenerate and the square area survives: area2 = +2
    assert rows == {7: (5, 2), 9: (4, -2), 4: (1, 0), 5: (2, 0)}
