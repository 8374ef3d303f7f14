"""Longest consecutive-day streak per key (pipelines/windows
.longest_streak_per_key) vs the DuckDB gaps-and-islands oracle."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import longest_streak_per_key

_SQL = """
    WITH d AS (SELECT DISTINCT k, CAST(ts AS DATE) AS day FROM tbl),
    r AS (SELECT k, day,
            day - CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY day)
                       AS INTEGER) AS grp
          FROM d),
    i AS (SELECT k, COUNT(*) AS len FROM r GROUP BY k, grp)
    SELECT k, CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS max_streak
    FROM i GROUP BY k"""


def test_streak_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(81)
    n = 4000
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(days=int(d), seconds=int(s))
          for d, s in zip(rng.integers(0, 60, n),
                          rng.integers(0, 86400, n))]
    tbl = pa.table({
        "k": pa.array(rng.integers(1, 40, n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })
    out = longest_streak_per_key(rd.from_arrow(tbl).repartition(6),
                                 "k", "ts", buckets=5)
    mine = {r["k"]: (r["n_active_days"], r["max_streak"])
            for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {k: (na, ms) for k, na, ms in oracle}


def test_streak_hand_fixture(ray_session):
    import ray.data as rd

    base = dt.datetime(2024, 3, 1)
    # k=1 active days 0,1,2, 5,6, 10 -> streaks 3,2,1; k=2 one day
    days1 = [0, 1, 2, 5, 6, 10, 1, 2]   # dups on 1,2
    tbl = pa.table({
        "k": pa.array([1] * 8 + [2], type=pa.int64()),
        "ts": pa.array([base + dt.timedelta(days=d) for d in days1]
                       + [base], type=pa.timestamp("us")),
    })
    out = longest_streak_per_key(rd.from_arrow(tbl), "k", "ts", buckets=3)
    rows = {r["k"]: (r["n_active_days"], r["max_streak"])
            for r in out.take_all()}
    assert rows == {1: (6, 3), 2: (1, 1)}
