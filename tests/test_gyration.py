"""Per-key radius of gyration (pipelines/windows.gyration_per_key) vs
the DuckDB exact-moment oracle (bit-identical float expression)."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import gyration_per_key

_SQL = """
    SELECT k, COUNT(*) AS n,
           CAST(SUM(x*x) + SUM(y*y) AS DOUBLE) / COUNT(*)
             - (CAST(SUM(x) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(x) AS DOUBLE) / COUNT(*))
             - (CAST(SUM(y) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS rg2
    FROM tbl GROUP BY k"""


def test_gyration_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(97)
    n = 3000
    tbl = pa.table({
        "k": pa.array(rng.integers(1, 40, n), type=pa.int64()),
        "x": pa.array(rng.integers(-18000, 18001, n), type=pa.int64()),
        "y": pa.array(rng.integers(-8500, 8501, n), type=pa.int64()),
    })
    out = gyration_per_key(rd.from_arrow(tbl).repartition(6),
                           "k", "x", "y", buckets=5)
    mine = {r["k"]: (r["n"], r["rg2"]) for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {k: (nn, r) for k, nn, r in oracle}


def test_gyration_hand_fixture(ray_session):
    import ray.data as rd

    # key 1: points (0,0), (2,0) -> mean (1,0); rg2 = (0+4)/2 - 1 = 1.0
    tbl = pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "x": pa.array([0, 2, 5], type=pa.int64()),
        "y": pa.array([0, 0, 5], type=pa.int64()),
    })
    out = gyration_per_key(rd.from_arrow(tbl), "k", "x", "y", buckets=2)
    rows = {r["k"]: (r["n"], r["rg2"]) for r in out.take_all()}
    assert rows == {1: (2, 1.0), 2: (1, 0.0)}
