"""Per-key turning-direction counts (pipelines/windows
.turn_counts_per_key) vs the DuckDB double-LAG cross-sign oracle."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import turn_counts_per_key

_SQL = """
    WITH st AS (SELECT user_id,
           lag(xf) OVER w - lag(xf, 2) OVER w AS dx1,
           lag(yf) OVER w - lag(yf, 2) OVER w AS dy1,
           xf - lag(xf) OVER w AS dx2,
           yf - lag(yf) OVER w AS dy2
         FROM tbl WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id))
    SELECT user_id,
      CAST(COALESCE(SUM(CASE WHEN dx1 IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_triples,
      CAST(COALESCE(SUM(CASE WHEN dx1*dy2 - dy1*dx2 > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_left,
      CAST(COALESCE(SUM(CASE WHEN dx1*dy2 - dy1*dx2 < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_right,
      CAST(COALESCE(SUM(CASE WHEN dx1*dy2 - dy1*dx2 = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_straight
    FROM st GROUP BY user_id"""


def _pts(seed=87, n=500, users=9, span=8):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 4, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 86400, n)]
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(1, users + 1, n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "xf": pa.array(rng.integers(-span, span + 1, n), type=pa.int64()),
        "yf": pa.array(rng.integers(-span, span + 1, n), type=pa.int64()),
    })


def test_turn_counts_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _pts()
    out = turn_counts_per_key(rd.from_arrow(tbl).repartition(6),
                              "user_id", "ts", "xf", "yf",
                              tie_col="event_id", buckets=5)
    mine = {r["user_id"]: (r["n_triples"], r["n_left"], r["n_right"],
                           r["n_straight"]) for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {row[0]: tuple(row[1:]) for row in oracle}
    for v in mine.values():
        assert v[0] == v[1] + v[2] + v[3]


def test_turn_counts_hand_fixture(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    # square walk: E, N, W, S -> three left turns; then straight E,E
    xs = [0, 1, 1, 0, 0, 1, 2]
    ys = [0, 0, 1, 1, 0, 0, 0]
    n = len(xs)
    tbl = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array([5] * n, type=pa.int64()),
        "ts": pa.array([t0 + dt.timedelta(minutes=i) for i in range(n)],
                       type=pa.timestamp("us")),
        "xf": pa.array(xs, type=pa.int64()),
        "yf": pa.array(ys, type=pa.int64()),
    })
    out = turn_counts_per_key(rd.from_arrow(tbl), "user_id", "ts",
                              "xf", "yf", tie_col="event_id", buckets=2)
    [row] = out.take_all()
    # triples: (E,N)=L, (N,W)=L, (W,S)=L, (S,E)=L, (E,E)=straight
    assert (row["n_triples"], row["n_left"], row["n_right"],
            row["n_straight"]) == (5, 4, 0, 1)
