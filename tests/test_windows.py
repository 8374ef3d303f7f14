"""Temporal operators: tumbling windowed aggregate + backward as-of join
(pipelines/windows.py), verified against DuckDB (including its native
ASOF JOIN) on randomized fixtures."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.windows import (
    asof_join, tumbling_window_aggregate,
)


def _events_tbl(seed=7, n=500, users=9):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 20 * 86400, n)]
    return pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.integers(1, users + 1, n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "value": pa.array(rng.uniform(0, 100, n)),
    })


def test_tumbling_window_aggregate_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _events_tbl()
    out = tumbling_window_aggregate(rd.from_arrow(tbl), "ts", 86400,
                                    ["user_id"], "value")
    mine = {(r["window"], r["user_id"]): (r["n"], round(r["total"], 6))
            for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS "window",
               user_id, COUNT(*) AS n, SUM(value) AS total
        FROM tbl GROUP BY "window", user_id""").fetchall()
    assert mine == {(w, u): (n, round(t, 6)) for w, u, n, t in oracle}


@pytest.mark.parametrize("seed", [1, 2])
def test_asof_join_vs_duckdb(ray_session, seed):
    import ray.data as rd

    left_tbl = _events_tbl(seed=seed, n=300)
    # right: sparse marker stream with distinct timestamps per user
    right_full = _events_tbl(seed=seed + 100, n=80)
    right_tbl = duckdb.sql("""
        SELECT user_id, ts, MAX(value) AS mark FROM right_full
        GROUP BY user_id, ts""").arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("ts", pa.timestamp("us")),
            ("mark", pa.float64())]))
    out = asof_join(rd.from_arrow(left_tbl), rd.from_arrow(right_tbl),
                    "user_id", "ts", ["mark"])
    mine = {r["event_id"]: (None if r["mark_r"] is None
                            else round(r["mark_r"], 9))
            for r in out.take_all()}
    assert len(mine) == 300
    oracle = duckdb.sql("""
        SELECT l.event_id, r.mark FROM left_tbl l
        ASOF LEFT JOIN right_tbl r
        ON l.user_id = r.user_id AND l.ts >= r.ts""").fetchall()
    exp = {e: (None if m is None else round(m, 9)) for e, m in oracle}
    assert mine == exp


def test_asof_join_unmatched_and_exact_ts(ray_session):
    """Inclusive boundary (l.ts >= r.ts) and all-null unmatched keys."""
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    left = pa.table({
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([t0, t0 + dt.timedelta(1), t0],
                       type=pa.timestamp("us")),
    })
    right = pa.table({
        "user_id": pa.array([1], type=pa.int64()),
        "ts": pa.array([t0], type=pa.timestamp("us")),
        "mark": pa.array([42.0]),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    "user_id", "ts", ["mark"])
    rows = {r["event_id"]: r["mark_r"] for r in out.take_all()}
    # exact-equal ts matches (inclusive); user 2 has no right rows
    assert rows == {1: 42.0, 2: 42.0, 3: None}


def test_asof_join_forward_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.pipelines.windows import asof_join

    rng = np.random.default_rng(17)
    n = 4000
    left_tbl = pa.table({
        "lid": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, 40, n)),
        "ts": pa.array(rng.integers(0, 10**6, n)).cast(pa.timestamp("us")),
    })
    right_tbl = pa.table({
        "k": pa.array(rng.integers(0, 40, n // 2)),
        "ts": pa.array(rng.integers(0, 10**6, n // 2))
            .cast(pa.timestamp("us")),
        "val": pa.array(rng.integers(0, 1000, n // 2)),
    })
    out = asof_join(rd.from_arrow(left_tbl).repartition(5),
                    rd.from_arrow(right_tbl).repartition(3),
                    "k", "ts", ["val"], direction="forward").take_all()
    mine = {r["lid"]: r["val_r"] for r in out}
    want = dict(duckdb.sql("""
        SELECT lid, (SELECT r.val FROM right_tbl r
                     WHERE r.k = l.k AND r.ts >= l.ts
                     ORDER BY r.ts, r.val LIMIT 1) AS val
        FROM left_tbl l""").fetchall())
    # ties on equal forward ts may pick any row; compare the attached ts
    # semantics instead when val differs: re-check via min-ts condition
    import collections
    rmap = collections.defaultdict(list)
    for k, ts, val in zip(right_tbl["k"].to_pylist(),
                          right_tbl["ts"].to_pylist(),
                          right_tbl["val"].to_pylist()):
        rmap[k].append((ts, val))
    lk = dict(zip(left_tbl["lid"].to_pylist(),
                  zip(left_tbl["k"].to_pylist(),
                      left_tbl["ts"].to_pylist())))
    assert set(mine) == set(want)
    for lid, got_val in mine.items():
        k, ts = lk[lid]
        cand = sorted((t, v) for t, v in rmap[k] if t >= ts)
        if not cand:
            assert got_val is None
        else:
            min_ts = cand[0][0]
            allowed = {v for t, v in cand if t == min_ts}
            assert got_val in allowed, lid
