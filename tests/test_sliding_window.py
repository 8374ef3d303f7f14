"""Hopping/sliding windowed aggregate (pipelines/windows
.sliding_window_aggregate) vs the DuckDB explode-form oracle, plus the
exact-membership property (every row lands in exactly width/hop windows)."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.windows import sliding_window_aggregate


def _events_tbl(seed=11, n=400, users=7):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 10 * 86400, n)]
    return pa.table({
        "user_id": pa.array(rng.integers(1, users + 1, n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "value": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
    })


def test_sliding_window_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _events_tbl()
    out = sliding_window_aggregate(rd.from_arrow(tbl), "ts",
                                   width_s=7200, hop_s=1800,
                                   key_cols=["user_id"], value_col="value")
    mine = {(r["window"], r["user_id"]): (r["n"], r["total"])
            for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT (CAST(floor(epoch(ts) / 1800) AS BIGINT) - i) * 1800
                   AS w, user_id, COUNT(*) AS n, SUM(value) AS total
        FROM tbl CROSS JOIN range(4) t(i)
        GROUP BY w, user_id""").fetchall()
    assert mine == {(w, u): (n, t) for w, u, n, t in oracle}


def test_sliding_window_membership_property(ray_session):
    """Sum of per-window counts == k x rows, and every window start is a
    hop multiple at most width-hop below the row's hop-floor."""
    import ray.data as rd

    tbl = _events_tbl(seed=3, n=200)
    out = sliding_window_aggregate(rd.from_arrow(tbl), "ts",
                                   width_s=3600, hop_s=900,
                                   key_cols=[], value_col="value")
    rows = out.take_all()
    assert sum(r["n"] for r in rows) == 4 * tbl.num_rows
    assert all(r["window"] % 900 == 0 for r in rows)


def test_sliding_window_rejects_bad_hop(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        sliding_window_aggregate(rd.from_arrow(_events_tbl()), "ts",
                                 width_s=3600, hop_s=1000,
                                 key_cols=[], value_col="value")
