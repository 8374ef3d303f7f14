"""Exact COUNT(DISTINCT) per key (pipelines/stats.distinct_per_key) vs
DuckDB, including null-free determinism across partitionings."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.stats import distinct_per_key


def test_distinct_per_key_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    n = 2000
    tbl = pa.table({
        "k": pa.array(rng.integers(1, 40, n), type=pa.int64()),
        "v": pa.array(np.array(["a", "b", "c", "d", "e", "f"])[
            rng.integers(0, 6, n)]),
    })
    for parts in (1, 11):
        out = distinct_per_key(rd.from_arrow(tbl).repartition(parts),
                               "k", "v")
        mine = {r["k"]: r["n_distinct"] for r in out.take_all()}
        oracle = duckdb.sql(
            "SELECT k, COUNT(DISTINCT v) FROM tbl GROUP BY k").fetchall()
        assert mine == dict(oracle)


def test_distinct_per_key_single_values(ray_session):
    import ray.data as rd

    tbl = pa.table({"k": pa.array([1, 1, 1, 2], type=pa.int64()),
                    "v": pa.array(["x", "x", "x", "y"])})
    out = distinct_per_key(rd.from_arrow(tbl), "k", "v")
    assert {r["k"]: r["n_distinct"] for r in out.take_all()} == {1: 1, 2: 1}
