"""Per-key Gini impurity (pipelines/stats.gini_impurity_per_key) vs the
DuckDB HUGEINT-exact oracle plus a hand fixture."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.stats import gini_impurity_per_key

_SQL = """
    WITH c AS (SELECT k, v, COUNT(*) AS c FROM tbl GROUP BY k, v)
    SELECT k, CAST(SUM(c) AS BIGINT) AS n_events,
           COUNT(*) AS n_types,
           CAST(SUM(c)*SUM(c) - SUM(c*c) AS DOUBLE)
               / CAST(SUM(c)*SUM(c) AS DOUBLE) AS impurity
    FROM c GROUP BY k"""


def test_gini_impurity_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(67)
    n = 2000
    tbl = pa.table({
        "k": pa.array(rng.integers(1, 40, n), type=pa.int64()),
        "v": pa.array(np.char.add("t", rng.integers(0, 6, n).astype(str)),
                      type=pa.string()),
    })
    out = gini_impurity_per_key(rd.from_arrow(tbl).repartition(6),
                                "k", "v")
    mine = {r["k"]: (r["n_events"], r["n_types"], r["impurity"])
            for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {k: (ne, nt, im) for k, ne, nt, im in oracle}


def test_gini_impurity_hand_fixture(ray_session):
    import ray.data as rd

    # key 'a': 3x + 1y -> 1 - (9+1)/16 = 0.375 ; key 'b': pure -> 0.0
    tbl = pa.table({
        "k": pa.array(["a", "a", "a", "a", "b", "b"]),
        "v": pa.array(["x", "x", "x", "y", "z", "z"]),
    })
    out = gini_impurity_per_key(rd.from_arrow(tbl), "k", "v")
    rows = {r["k"]: (r["n_events"], r["n_types"], r["impurity"])
            for r in out.take_all()}
    assert rows == {"a": (4, 2, 0.375), "b": (2, 1, 0.0)}
