"""Star-join analytics pipeline (pipelines/analytics.region_revenue) vs
the DuckDB six-table oracle on the sf0.001 testdata, plus the empty-side
guard."""

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from osmium_tool_ray.pipelines.analytics import region_revenue

SF = "/root/testdata/sf0.001"


def _dims():
    return (pq.read_table(f"{SF}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"]),
            pq.read_table(f"{SF}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"]),
            pq.read_table(f"{SF}/nation.parquet"),
            pq.read_table(f"{SF}/region.parquet"))


@pytest.mark.parametrize("region_name", ["ASIA", "EUROPE"])
def test_region_revenue_vs_duckdb(ray_session, region_name):
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    out = region_revenue(lineitem, orders, *_dims(), region_name,
                         np.datetime64("1995-01-01"),
                         np.datetime64("1999-01-01"))
    mine = {r["n_name"]: r["revenue_c4"] for r in out.take_all()}
    oracle = duckdb.sql(f"""
        SELECT n_name,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   AS revenue_c4
        FROM read_parquet('{SF}/lineitem.parquet') l,
             read_parquet('{SF}/orders.parquet') o,
             read_parquet('{SF}/customer.parquet') c,
             read_parquet('{SF}/supplier.parquet') s,
             read_parquet('{SF}/nation.parquet') n,
             read_parquet('{SF}/region.parquet') r
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = '{region_name}'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY n_name""").fetchall()
    assert mine == dict(oracle)
    assert mine                         # non-trivial at this sf


def test_region_revenue_empty_window(ray_session):
    """A date window with no orders must return an empty, well-schema'd
    result (the Acero empty-side crash guard)."""
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    out = region_revenue(lineitem, orders, *_dims(), "ASIA",
                         np.datetime64("1970-01-01"),
                         np.datetime64("1970-01-02"))
    assert out.take_all() == []
    assert set(out.schema().names) == {"n_name", "revenue_c4"}


def test_region_revenue_join_path_parity(ray_session):
    """broadcast_cap=0 forces the hash-partitioned Acero join (the scale
    path); result must equal the broadcast-fold default."""
    import ray.data as rd

    lineitem = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    args = (lineitem, orders, *_dims(), "ASIA",
            np.datetime64("1995-01-01"), np.datetime64("1999-01-01"))
    bc = {r["n_name"]: r["revenue_c4"]
          for r in region_revenue(*args).take_all()}
    jn = {r["n_name"]: r["revenue_c4"]
          for r in region_revenue(*args, broadcast_cap=0).take_all()}
    assert bc == jn and len(bc) > 0
