"""Per-key winsorization (pipelines/stats.winsorize_per_key) vs the
DuckDB quantile_disc clip oracle."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.stats import winsorize_per_key

_SQL = """
    WITH q AS (SELECT k, quantile_disc(v, 0.05) lo,
                      quantile_disc(v, 0.95) hi
               FROM tbl GROUP BY k)
    SELECT t.i, t.k, LEAST(GREATEST(t.v, q.lo), q.hi) AS value_w
    FROM tbl t JOIN q USING (k)"""


def test_winsorize_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(131)
    n = 2500
    tbl = pa.table({
        "i": pa.array(range(n), type=pa.int64()),
        "k": pa.array(rng.integers(1, 30, n), type=pa.int64()),
        "v": pa.array(np.round(rng.normal(0, 50, n), 3)),
    })
    out = winsorize_per_key(rd.from_arrow(tbl).repartition(6),
                            "k", "v", "i", buckets=5)
    mine = {r["i"]: (r["k"], r["value_w"]) for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {i: (k, w) for i, k, w in oracle}
    assert len(mine) == n


def test_winsorize_hand_fixture(ray_session):
    import ray.data as rd

    # 10 values 0..9: lo=ceil(.05*10)-1=0 -> 0; hi=ceil(.95*10)-1=9? no:
    # ceil(9.5)-1 = 9 -> value 9 (no clip at top); lo_q .2 -> idx 1
    tbl = pa.table({
        "i": pa.array(range(10), type=pa.int64()),
        "k": pa.array([1] * 10, type=pa.int64()),
        "v": pa.array([float(x) for x in range(10)]),
    })
    out = winsorize_per_key(rd.from_arrow(tbl), "k", "v", "i",
                            lo_q=0.2, hi_q=0.8, buckets=2)
    rows = {r["i"]: r["value_w"] for r in out.take_all()}
    # lo idx = ceil(2)-1 = 1 -> 1.0 ; hi idx = ceil(8)-1 = 7 -> 7.0
    assert rows[0] == 1.0 and rows[9] == 7.0 and rows[5] == 5.0
