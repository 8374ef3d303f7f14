"""SCD2 validity intervals (pipelines/merge.scd2_intervals) vs the
DuckDB LEAD + sentinel oracle."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.merge import scd2_intervals

_SQL = """
    SELECT k, v, ts AS valid_from,
           COALESCE(lead(ts) OVER (PARTITION BY k ORDER BY ts, v),
                    TIMESTAMP '9999-12-31') AS valid_to
    FROM tbl"""


def test_scd2_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(91)
    n = 1500
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 10**6, n)]
    tbl = pa.table({
        "k": pa.array(rng.integers(1, 30, n), type=pa.int64()),
        "v": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })
    out = scd2_intervals(rd.from_arrow(tbl).repartition(5), "k", "ts",
                         tie_col="v", carry_cols=["v"], buckets=4)
    mine = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"])
            for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {(k, v): (f, t) for k, v, f, t in oracle}
    assert len(mine) == n


def test_scd2_hand_fixture(ray_session):
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "v": pa.array([1, 2, 3], type=pa.int64()),
        "ts": pa.array([t0, t0 + dt.timedelta(days=1), t0],
                       type=pa.timestamp("us")),
    })
    out = scd2_intervals(rd.from_arrow(tbl), "k", "ts", tie_col="v",
                         carry_cols=["v"], buckets=2)
    rows = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"])
            for r in out.take_all()}
    sent = dt.datetime(9999, 12, 31)
    assert rows == {
        ("a", 1): (t0, t0 + dt.timedelta(days=1)),
        ("a", 2): (t0 + dt.timedelta(days=1), sent),
        ("b", 3): (t0, sent),
    }


def test_scd2_dup_key_ts_deterministic_without_tie(ray_session):
    """Duplicate (key, ts) rows with tie_col=None: the carry-derived
    tiebreak makes repeated runs emit identical carry/valid_to pairings
    (round-3 ADVICE: lexsort ties fell back to block order)."""
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 2),
        "v": pa.array([10, 20, 30, 40, 1, 2], type=pa.int64()),
        "ts": pa.array([t0, t0, t0, t0 + dt.timedelta(days=1), t0, t0],
                       type=pa.timestamp("us")),
    })
    runs = []
    for i in range(3):
        out = scd2_intervals(
            rd.from_arrow(tbl).repartition(3 + i), "k", "ts",
            tie_col=None, carry_cols=["v"], buckets=4)
        runs.append(sorted((r["k"], r["v"], r["valid_from"],
                            r["valid_to"]) for r in out.take_all()))
    assert runs[0] == runs[1] == runs[2]
    assert len(runs[0]) == 6
