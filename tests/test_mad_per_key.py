"""Per-key median + MAD (pipelines/stats.mad_per_key) vs the DuckDB
quantile_disc oracle and a hand fixture."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.stats import mad_per_key

_SQL = """
    WITH med AS (SELECT k, COUNT(*) AS n,
                        quantile_disc(v, 0.5) AS median
                 FROM tbl GROUP BY k)
    SELECT m.k, m.n, m.median,
           quantile_disc(abs(t.v - m.median), 0.5) AS mad
    FROM tbl t JOIN med m USING (k)
    GROUP BY m.k, m.n, m.median"""


def test_mad_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(71)
    n = 3000
    tbl = pa.table({
        "k": pa.array(rng.integers(1, 50, n), type=pa.int64()),
        "v": pa.array(np.round(rng.normal(10, 4, n), 3)),
    })
    out = mad_per_key(rd.from_arrow(tbl).repartition(7), "k", "v",
                      buckets=6)
    mine = {r["k"]: (r["n"], r["median"], r["mad"])
            for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {k: (nn, me, md) for k, nn, me, md in oracle}


def test_mad_hand_fixture(ray_session):
    import ray.data as rd

    # k=1: values 1,2,3,4 -> disc median idx ceil(4/2)-1=1 -> 2;
    # deviations |1-2|,|0|,|1|,|2| sorted 0,1,1,2 -> mad idx 1 -> 1
    # k=2: single value -> median=v, mad=0
    tbl = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 7.0]),
    })
    out = mad_per_key(rd.from_arrow(tbl), "k", "v", buckets=3)
    rows = {r["k"]: (r["n"], r["median"], r["mad"])
            for r in out.take_all()}
    assert rows == {1: (4, 2.0, 1.0), 2: (1, 7.0, 0.0)}


def test_mad_string_keys(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(72)
    n = 500
    tbl = pa.table({
        "k": pa.array(np.char.add("u", rng.integers(0, 9, n).astype(str))),
        "v": pa.array(rng.uniform(0, 100, n)),
    })
    out = mad_per_key(rd.from_arrow(tbl).repartition(4), "k", "v",
                      buckets=4)
    mine = {r["k"]: (r["n"], r["median"], r["mad"])
            for r in out.take_all()}
    oracle = duckdb.sql(_SQL).fetchall()
    assert mine == {k: (nn, me, md) for k, nn, me, md in oracle}
