"""Range (band) join (pipelines/windows.range_join) vs a DuckDB interval
join on a randomized fixture, plus boundary and out-of-band cases."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import range_join


def _bands():
    return pa.table({
        "lo": pa.array([0.0, 10.0, 50.0]),
        "hi": pa.array([10.0, 50.0, 100.0]),
        "tier": pa.array(["low", "mid", "high"]),
    })


def test_range_join_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    left_tbl = pa.table({
        "id": pa.array(range(400), type=pa.int64()),
        "v": pa.array(rng.uniform(-20, 120, 400)),
    })
    bands_tbl = _bands()
    out = range_join(rd.from_arrow(left_tbl), rd.from_arrow(bands_tbl), "v")
    mine = {r["id"]: r["tier"] for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT l.id, b.tier FROM left_tbl l
        LEFT JOIN bands_tbl b ON l.v >= b.lo AND l.v < b.hi""").fetchall()
    assert mine == dict(oracle)
    assert len(mine) == 400


def test_range_join_boundaries(ray_session):
    """[lo, hi): lo inclusive, hi exclusive; outside -> null."""
    import ray.data as rd

    left = pa.table({"id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                     "v": pa.array([0.0, 9.999, 10.0, 100.0, -1.0])})
    out = range_join(rd.from_arrow(left), rd.from_arrow(_bands()), "v")
    rows = {r["id"]: r["tier"] for r in out.take_all()}
    assert rows == {1: "low", 2: "low", 3: "mid", 4: None, 5: None}
