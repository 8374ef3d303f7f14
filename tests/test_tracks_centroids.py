"""Per-key track length (pipelines/windows.track_length) vs the DuckDB
lag-window oracle, plus hand-computed fixtures."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import track_length


def _pts(seed=19, n=300, users=8):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 2, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 86400, n)]
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(1, users + 1, n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "xf": pa.array(rng.integers(-10**9, 10**9, n), type=pa.int64()),
        "yf": pa.array(rng.integers(-10**9, 10**9, n), type=pa.int64()),
    })


def test_track_length_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _pts()
    out = track_length(rd.from_arrow(tbl).repartition(6), "user_id", "ts",
                       "xf", "yf", tie_col="event_id")
    mine = {r["user_id"]: (r["n_points"], r["track_fix"])
            for r in out.take_all()}
    oracle = duckdb.sql("""
        WITH st AS (SELECT user_id,
               abs(xf - lag(xf) OVER w) + abs(yf - lag(yf) OVER w) AS step
             FROM tbl WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts, event_id))
        SELECT user_id, COUNT(*) AS n, COALESCE(SUM(step), 0) AS t
        FROM st GROUP BY user_id""").fetchall()
    assert mine == {u: (n, t) for u, n, t in oracle}


def test_track_length_hand_fixture(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 9], type=pa.int64()),
        "ts": pa.array([t0, t0 + dt.timedelta(1), t0 + dt.timedelta(2), t0],
                       type=pa.timestamp("us")),
        "xf": pa.array([0, 3, 3, 100], type=pa.int64()),
        "yf": pa.array([0, 4, 10, 100], type=pa.int64()),
    })
    out = track_length(rd.from_arrow(tbl), "user_id", "ts", "xf", "yf",
                       tie_col="event_id")
    rows = {r["user_id"]: (r["n_points"], r["track_fix"])
            for r in out.take_all()}
    # user 7: |3-0|+|4-0| + |3-3|+|10-4| = 7 + 6 = 13; user 9: single point
    assert rows == {7: (3, 13), 9: (1, 0)}
