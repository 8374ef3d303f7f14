"""shipping_priority (pipelines/analytics.shipping_priority, TPC-H Q3):
broadcast path vs the forced hash-join path (broadcast_cap=0) on sf0.001,
plus a DuckDB cross-check of the full ordered top-k."""
import duckdb
import numpy as np

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def _run(**kw):
    import pyarrow.parquet as pq
    from osmium_tool_ray.pipelines.analytics import shipping_priority
    from osmium_tool_ray.sources.readers import read_parquet_clean

    lineitem = read_parquet_clean(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
    orders = read_parquet_clean(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])
    customer = pq.read_table(f"{SF}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
    return shipping_priority(lineitem, orders, customer, "BUILDING",
                             np.datetime64("1995-03-15"), **kw) \
        .to_pandas().reset_index(drop=True)


def test_q3_matches_duckdb_and_join_path_matches_broadcast(ray_session):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(E.oracle_sql()["shipping_priority"]).fetchdf()
    got = _run()
    assert got[["l_orderkey", "revenue_c4", "o_orderpriority"]] \
        .values.tolist() == \
        want[["l_orderkey", "revenue_c4", "o_orderpriority"]] \
        .values.tolist()
    assert (got.o_orderdate.values == want.o_orderdate.values).all()
    forced = _run(broadcast_cap=0)          # hash-join scale path
    assert forced.values.tolist() == got.values.tolist()
