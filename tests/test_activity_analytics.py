"""Daily-active-users and weekly-retention query compositions vs DuckDB
on a randomized events fixture (driven through the __ray_entry__
callables by writing the fixture as a parquet sf dir)."""

import datetime as dt
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_activity"))
    rng = np.random.default_rng(33)
    n = 1200
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 45 * 86400, n)]
    tbl = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 25, n), type=pa.int64()),
        "event_type": pa.array(np.array(["click", "view"])[
            rng.integers(0, 2, n)]),
        "value": pa.array(rng.uniform(0, 10, n)),
        "props": pa.array(['{"k": 1}'] * n),
    })
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    return d


def test_daily_active_users(ray_session, sf_dir):
    import __ray_entry__ as E

    out = E.queries()["daily_active_users"](sf_dir)
    mine = {r["day"]: r["dau"] for r in out.take_all()}
    oracle = duckdb.sql(f"""
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS day,
               COUNT(DISTINCT user_id) AS dau
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY day
        """).fetchall()
    assert mine == dict(oracle)


def test_weekly_retention(ray_session, sf_dir):
    import __ray_entry__ as E

    out = E.queries()["weekly_retention"](sf_dir)
    mine = {r["wk"]: r["retained"] for r in out.take_all()}
    oracle = duckdb.sql(f"""
        WITH uw AS (SELECT DISTINCT user_id,
                        CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
                    FROM read_parquet('{sf_dir}/events.parquet'))
        SELECT b.wk, COUNT(*) FROM uw a JOIN uw b
          ON b.user_id = a.user_id AND b.wk = a.wk + 1
        GROUP BY b.wk""").fetchall()
    assert mine == dict(oracle)
    assert mine            # non-trivial on this fixture
