"""Per-column numeric profiler (pipelines/stats.profile_numeric) vs a
DuckDB union oracle, including null handling."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.stats import profile_numeric


def test_profile_vs_duckdb_with_nulls(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(27)
    n = 1500
    a = rng.normal(10, 5, n)
    b = rng.integers(-50, 50, n).astype(np.float64)
    b[::7] = np.nan                       # -> real Arrow nulls below
    tbl = pa.table({"a": pa.array(a),
                    "b": pa.array(b, from_pandas=True)})
    out = profile_numeric(rd.from_arrow(tbl).repartition(8), ["a", "b"])
    mine = {r["column"]: (r["n"], r["nulls"], r["vmin"], r["vmax"],
                          r["isum"]) for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT col, COUNT(*) AS n, COUNT(*) - COUNT(v) AS nulls,
               MIN(v), MAX(v), SUM(CAST(FLOOR(v) AS BIGINT))
        FROM (SELECT 'a' AS col, a AS v FROM tbl
              UNION ALL SELECT 'b', b FROM tbl)
        GROUP BY col""").fetchall()
    assert mine == {c: (nn, nu, mn, mx, s) for c, nn, nu, mn, mx, s
                    in oracle}
    assert mine["b"][1] == (1500 + 6) // 7    # planted NaN count
