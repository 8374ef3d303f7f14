"""Per-key compass-sector histogram (pipelines/windows.track_sectors)
vs the DuckDB lag-window CASE oracle, plus a hand fixture covering every
sector and the tie (|dx|==|dy|) diagonals."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import track_sectors, _SECTOR_COLS

_SECTOR_SQL = """
    WITH st AS (SELECT user_id,
           xf - lag(xf) OVER w AS dx,
           yf - lag(yf) OVER w AS dy
         FROM tbl WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id))
    SELECT user_id, CAST(COUNT(*) - 1 AS BIGINT) AS n_segs,
      CAST(COALESCE(SUM(CASE WHEN abs(dx) > abs(dy) AND dx > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_e,
      CAST(COALESCE(SUM(CASE WHEN abs(dx) = abs(dy) AND dx > 0 AND dy > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ne,
      CAST(COALESCE(SUM(CASE WHEN abs(dy) > abs(dx) AND dy > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_n,
      CAST(COALESCE(SUM(CASE WHEN abs(dx) = abs(dy) AND dx < 0 AND dy > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nw,
      CAST(COALESCE(SUM(CASE WHEN abs(dx) > abs(dy) AND dx < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_w,
      CAST(COALESCE(SUM(CASE WHEN abs(dx) = abs(dy) AND dx < 0 AND dy < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_sw,
      CAST(COALESCE(SUM(CASE WHEN abs(dy) > abs(dx) AND dy < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_s,
      CAST(COALESCE(SUM(CASE WHEN abs(dx) = abs(dy) AND dx > 0 AND dy < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_se,
      CAST(COALESCE(SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_still
    FROM st GROUP BY user_id"""


def _pts(seed=23, n=400, users=9, span=6):
    """Small coordinate span so tie diagonals and stills actually occur."""
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 86400, n)]
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(1, users + 1, n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "xf": pa.array(rng.integers(-span, span + 1, n), type=pa.int64()),
        "yf": pa.array(rng.integers(-span, span + 1, n), type=pa.int64()),
    })


def test_track_sectors_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _pts()
    out = track_sectors(rd.from_arrow(tbl).repartition(6), "user_id", "ts",
                        "xf", "yf", tie_col="event_id", buckets=5)
    cols = ["n_segs"] + list(_SECTOR_COLS)
    mine = {r["user_id"]: tuple(r[c] for c in cols) for r in out.take_all()}
    oracle = {row[0]: tuple(row[1:])
              for row in duckdb.sql(_SECTOR_SQL).fetchall()}
    assert mine == oracle
    # sectors + still partition the segments exactly
    for u, v in mine.items():
        assert v[0] == sum(v[1:]), (u, v)


def test_track_sectors_hand_fixture(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    n = 10
    ts = [t0 + dt.timedelta(minutes=i) for i in range(n)]
    # user 7 walks: E, NE, N, NW, W, SW, S, SE, still
    xs = [0, 5, 6, 6, 5, 0, -1, -1, 0, 0]
    ys = [0, 1, 2, 9, 10, 8, 7, 0, -1, -1]
    tbl = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array([7] * n, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "xf": pa.array(xs, type=pa.int64()),
        "yf": pa.array(ys, type=pa.int64()),
    })
    out = track_sectors(rd.from_arrow(tbl), "user_id", "ts", "xf", "yf",
                        tie_col="event_id", buckets=3)
    [row] = out.take_all()
    assert row["n_segs"] == 9
    assert all(row[c] == 1 for c in _SECTOR_COLS), row


def test_track_sectors_single_point_and_int_keys(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "event_id": pa.array([1], type=pa.int64()),
        "user_id": pa.array([42], type=pa.int64()),
        "ts": pa.array([t0], type=pa.timestamp("us")),
        "xf": pa.array([3], type=pa.int64()),
        "yf": pa.array([4], type=pa.int64()),
    })
    out = track_sectors(rd.from_arrow(tbl), "user_id", "ts", "xf", "yf",
                        tie_col="event_id", buckets=2)
    [row] = out.take_all()
    assert row["n_segs"] == 0
    assert all(row[c] == 0 for c in _SECTOR_COLS)
