"""Gap-based sessionization (pipelines/windows.sessionize) vs the DuckDB
lag()+running-sum window form, plus hand-built boundary cases."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import sessionize


def test_sessionize_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = dt.datetime(2024, 1, 1)
    n = 600
    tbl = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(1, 8, n), type=pa.int64()),
        "ts": pa.array([base + dt.timedelta(seconds=int(s))
                        for s in rng.integers(0, 5 * 86400, n)],
                       type=pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(tbl), "user_id", "ts", 1800)
    mine = {r["event_id"]: r["session"] for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT event_id,
               SUM(CASE WHEN prev_ts IS NOT NULL
                        AND epoch(ts) - epoch(prev_ts) > 1800
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session
        FROM (SELECT event_id, user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         AS prev_ts
              FROM tbl)""").fetchall()
    assert mine == {e: s for e, s in oracle}
    assert len(mine) == n


def test_sessionize_boundaries(ray_session):
    """Gap strictly greater than gap_s starts a new session; equal-gap
    events stay in the same session; sessions are 0-based per key."""
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "ts": pa.array([t0,
                        t0 + dt.timedelta(seconds=60),      # == gap: same
                        t0 + dt.timedelta(seconds=121),     # > gap: new
                        t0,
                        t0 + dt.timedelta(seconds=61)],     # > gap: new
                       type=pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(tbl).repartition(3), "user_id", "ts", 60)
    rows = {r["event_id"]: r["session"] for r in out.take_all()}
    assert rows == {1: 0, 2: 0, 3: 1, 4: 0, 5: 1}


def test_session_stats_query(ray_session):
    """Per-session rollup (queries: session_stats) vs DuckDB on the
    sf0.001 events table — counts and exact microsecond durations."""
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["session_stats"](sf)
    mine = {(r["user_id"], r["session"]): (r["n_events"], r["duration_us"])
            for r in out.take_all()}
    oracle = duckdb.sql(f"""
        WITH s AS (
            SELECT user_id, ts,
                   SUM(CASE WHEN prev_ts IS NOT NULL
                            AND epoch(ts) - epoch(prev_ts) > 1800
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             AS prev_ts
                  FROM read_parquet('{sf}/events.parquet')))
        SELECT user_id, session, COUNT(*),
               MAX(epoch_us(ts)) - MIN(epoch_us(ts))
        FROM s GROUP BY user_id, session""").fetchall()
    assert mine == {(u, s): (n, d) for u, s, n, d in oracle}
    assert any(n > 1 for n, _ in mine.values())
