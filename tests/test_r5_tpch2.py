"""Round-5 TPC-H wave 2: Q4/Q14/Q15/Q18/Q22 shapes — forced-path
parity (broadcast vs hash-join) and sf0.001 non-emptiness."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted([tuple(sorted(r.items())) for r in ds.take_all()])


def test_late_order_priority_paths_agree(ray_session):
    from osmium_tool_ray.pipelines.analytics import late_order_priority
    from osmium_tool_ray.sources.readers import read_parquet_clean

    def args():
        return (read_parquet_clean(f"{SF}/lineitem.parquet",
                                   columns=["l_orderkey", "l_shipdate"]),
                read_parquet_clean(f"{SF}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate",
                                            "o_orderpriority"]),
                np.datetime64("1996-07-01"), np.datetime64("1996-10-01"))

    broad = _rows(late_order_priority(*args(), late_days=60))
    joined = _rows(late_order_priority(*args(), late_days=60,
                                       broadcast_cap=0))
    assert broad == joined
    assert len(broad) > 0
    total = sum(dict(r)["order_count"] for r in broad)
    assert total > 0


def test_large_orders_paths_agree(ray_session):
    from osmium_tool_ray.pipelines.analytics import large_orders
    from osmium_tool_ray.sources.readers import read_parquet_clean

    customer = pq.read_table(f"{SF}/customer.parquet",
                             columns=["c_custkey", "c_name"])

    def args():
        return (read_parquet_clean(f"{SF}/lineitem.parquet",
                                   columns=["l_orderkey", "l_quantity"]),
                read_parquet_clean(f"{SF}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey",
                                            "o_orderdate",
                                            "o_totalprice"]),
                customer)

    broad = _rows(large_orders(*args(), qty_threshold=150, k=100))
    joined = _rows(large_orders(*args(), qty_threshold=150, k=100,
                                survivor_cap=0))
    assert broad == joined
    assert len(broad) > 0
    # HAVING respected: every surviving order really exceeds threshold
    for r in broad:
        assert dict(r)["sum_qty"] > 150


def test_dormant_customers_paths_agree(ray_session):
    from osmium_tool_ray.pipelines.analytics import dormant_customers
    from osmium_tool_ray.sources.readers import read_parquet_clean

    def args():
        return (read_parquet_clean(f"{SF}/customer.parquet",
                                   columns=["c_custkey", "c_nationkey",
                                            "c_acctbal"]),
                read_parquet_clean(f"{SF}/orders.parquet",
                                   columns=["o_custkey", "o_orderdate"]),
                np.datetime64("2000-01-01"))

    broad = _rows(dormant_customers(*args()))
    joined = _rows(dormant_customers(*args(), broadcast_cap=0))
    assert broad == joined
    assert len(broad) > 0


def test_top_supplier_tie_semantics(ray_session):
    import ray.data as rd

    from osmium_tool_ray.pipelines.analytics import top_supplier

    # two suppliers tie at max revenue: both must be returned
    li = rd.from_arrow(pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3], type=pa.int64()),
        "l_shipdate": pa.array([np.datetime64("1996-02-01", "us")] * 4,
                               type=pa.timestamp("us")),
        "l_extendedprice": pa.array([200.0, 100.0, 100.0, 50.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])}))
    supp = pa.table({"s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                     "s_name": pa.array(["a", "b", "c"])})
    out = top_supplier(li, supp, np.datetime64("1996-01-01"),
                       np.datetime64("1997-01-01")).take_all()
    got = sorted((r["s_suppkey"], r["total_revenue_c4"]) for r in out)
    assert got == [(1, 200_0000 * 100 // 100), (2, 200_0000)]
    # empty window -> empty result with stable schema
    empty = top_supplier(li, supp, np.datetime64("1990-01-01"),
                         np.datetime64("1990-02-01"))
    assert empty.count() == 0
    assert set(empty.schema().names) == {"s_suppkey", "s_name",
                                         "total_revenue_c4"}


def test_promo_revenue_matches_pandas(ray_session):
    from osmium_tool_ray.pipelines.analytics import promo_revenue
    from osmium_tool_ray.sources.readers import read_parquet_clean

    li = read_parquet_clean(f"{SF}/lineitem.parquet",
                            columns=["l_partkey", "l_shipdate",
                                     "l_extendedprice", "l_discount"])
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_type"])
    out = promo_revenue(li, part, np.datetime64("1996-01-01"),
                        np.datetime64("1996-02-01")).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["total_c4"] > 0 and 0.0 <= r["promo_pct"] <= 100.0

    df = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    pt = dict(zip(part["p_partkey"].to_pylist(),
                  part["p_type"].to_pylist()))
    df = df[(df["l_shipdate"] >= "1996-01-01")
            & (df["l_shipdate"] < "1996-02-01")]
    rev = (np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
           * (100 - np.rint(df["l_discount"].to_numpy() * 100)
              .astype(np.int64)))
    promo = np.array([pt[k] == "PROMO"
                      for k in df["l_partkey"]], dtype=np.int64)
    assert r["total_c4"] == int(rev.sum())
    assert r["promo_c4"] == int((rev * promo).sum())


def test_sf0001_nonempty(ray_session):
    import __ray_entry__ as E

    for name in ["late_order_priority", "promo_revenue", "large_orders",
                 "dormant_customers", "top_supplier"]:
        out = E.queries()[name](SF)
        assert out.count() > 0, name
