"""Sliding-window exact distinct (pipelines/windows.sliding_distinct)
vs the DuckDB explode + COUNT(DISTINCT) oracle."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import sliding_distinct


def test_sliding_distinct_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(101)
    n = 3000
    base = dt.datetime(2024, 5, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 6 * 3600, n)]
    tbl = pa.table({
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "u": pa.array(rng.integers(1, 60, n), type=pa.int64()),
    })
    hop, k = 900, 4
    out = sliding_distinct(rd.from_arrow(tbl).repartition(6), "ts", "u",
                           width_s=hop * k, hop_s=hop, buckets=5)
    mine = {r["window"]: r["n_distinct"] for r in out.take_all()}
    oracle = duckdb.sql(f"""
        SELECT (epoch_us(ts) // ({hop}::BIGINT * 1000000) - i) * {hop}
                   AS w,
               COUNT(DISTINCT u) AS nd
        FROM tbl CROSS JOIN range({k}) t(i) GROUP BY w""").fetchall()
    assert mine == {w: nd for w, nd in oracle}


def test_sliding_distinct_hand_fixture(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    # hop 60s, width 120s (k=2); users 1,1,2 in minute 0, user 3 in min 1
    tbl = pa.table({
        "ts": pa.array([t0, t0 + dt.timedelta(seconds=30),
                        t0 + dt.timedelta(seconds=40),
                        t0 + dt.timedelta(seconds=70)],
                       type=pa.timestamp("us")),
        "u": pa.array([1, 1, 2, 3], type=pa.int64()),
    })
    out = sliding_distinct(rd.from_arrow(tbl), "ts", "u",
                           width_s=120, hop_s=60, buckets=3)
    rows = {r["window"]: r["n_distinct"] for r in out.take_all()}
    base = int(t0.timestamp())
    # window starting at minute 0 covers minutes 0-1: users {1,2} from
    # its hop plus {3} via the minute-1 hop exploding back
    assert rows[base] == 3          # users 1,2,3
    assert rows[base - 60] == 2     # minute -1 window sees minute-0 rows
    assert rows[base + 60] == 1     # user 3 only
