"""Distributed prefix scan (windows.running_total) and exact
distributed quantiles (stats.exact_quantiles): parity vs pandas/numpy
windows, integer bit-exactness, and partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.stats import exact_quantiles
from osmium_tool_ray.pipelines.windows import running_total


@pytest.fixture(scope="module")
def events(ray_session):
    rng = np.random.default_rng(31)
    n = 12_000
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 200, n)),
        "ts": pa.array(rng.integers(0, 10**6, n)),
        "ival": pa.array(rng.integers(0, 1000, n)),
    })


def _ds(ray_session, tbl, parts):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(parts)


def test_global_running_total_exact(ray_session, events):
    out = running_total(_ds(ray_session, events, 9), ["event_id"], "ival") \
        .take_all()
    got = {r["event_id"]: r["running_total"] for r in out}
    want = np.cumsum(events["ival"].to_numpy())   # already event_id order
    assert len(got) == events.num_rows
    assert all(got[i] == want[i] for i in range(events.num_rows))


def test_global_running_total_partitioning_invariant(ray_session, events):
    a = running_total(_ds(ray_session, events, 3), ["event_id"], "ival").take_all()
    b = running_total(_ds(ray_session, events, 14), ["event_id"], "ival").take_all()
    assert sorted((r["event_id"], r["running_total"]) for r in a) \
        == sorted((r["event_id"], r["running_total"]) for r in b)


def test_keyed_running_total_matches_pandas(ray_session, events):
    out = running_total(_ds(ray_session, events, 7), ["ts", "event_id"],
                        "ival", key_col="user_id").take_all()
    got = sorted((r["user_id"], r["event_id"], r["running_total"]) for r in out)

    df = events.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["rt"] = df.groupby("user_id")["ival"].cumsum()
    want = sorted(df[["user_id", "event_id", "rt"]]
                  .itertuples(index=False, name=None))
    assert got == want


def test_exact_quantiles_match_numpy(ray_session, events):
    import math

    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    out = exact_quantiles(_ds(ray_session, events, 11), "ival", qs)
    v = np.sort(events["ival"].to_numpy())
    n = len(v)
    want = [v[max(math.ceil(q * n) - 1, 0)] for q in qs]
    assert out["value"].to_pylist() == want
    assert out["q"].to_pylist() == qs


def test_exact_quantiles_duckdb_parity(ray_session, events):
    import duckdb

    qs = [0.25, 0.5, 0.75]
    out = exact_quantiles(_ds(ray_session, events, 5), "ival", qs)
    con = duckdb.connect()
    con.register("t", events.to_pandas())
    want = con.sql("SELECT quantile_disc(ival, [0.25, 0.5, 0.75]) FROM t") \
        .fetchone()[0]
    assert out["value"].to_pylist() == list(want)


def test_grouped_quantiles_match_duckdb(ray_session, events):
    import duckdb

    from osmium_tool_ray.pipelines.stats import grouped_quantiles

    out = grouped_quantiles(_ds(ray_session, events, 6), "user_id",
                            "ival", [0.5, 0.9]).take_all()
    got = sorted((r["user_id"], r["q0_5"], r["q0_9"]) for r in out)
    con = duckdb.connect()
    con.register("t", events.to_pandas())
    want = sorted(map(tuple, con.sql(
        "SELECT user_id, quantile_disc(ival, 0.5), quantile_disc(ival, 0.9) "
        "FROM t GROUP BY user_id").fetchall()))
    assert got == want


def test_exact_quantiles_empty(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"x": pa.array([], type=pa.int64())}))
    out = exact_quantiles(empty, "x", [0.5])
    assert out.num_rows == 0


def test_rank_transform_vs_duckdb(ray_session):
    """rank_transform row numbers and percent ranks, including
    partitioning invariance and the n=1 denominator guard."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.pipelines.stats import rank_transform

    rng = np.random.default_rng(51)
    tbl = pa.table({
        "id": pa.array(np.arange(400, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 50, 400), type=pa.int64()),
    })
    for parts in (1, 13):
        out = rank_transform(rd.from_arrow(tbl).repartition(parts),
                             ["v", "id"])
        mine = {r["id"]: (r["rn"], r["pct"]) for r in out.take_all()}
        oracle = duckdb.sql("""
            SELECT id, row_number() OVER w AS rn,
                   CAST(row_number() OVER w - 1 AS DOUBLE)
                       / GREATEST(COUNT(*) OVER () - 1, 1) AS pct
            FROM tbl WINDOW w AS (ORDER BY v, id)""").fetchall()
        assert mine == {i: (rn, p) for i, rn, p in oracle}

    one = pa.table({"id": pa.array([1], type=pa.int64()),
                    "v": pa.array([5], type=pa.int64())})
    got = rank_transform(rd.from_arrow(one), ["v", "id"]).take_all()
    assert got[0]["rn"] == 1 and got[0]["pct"] == 0.0


def test_iqr_outliers_query(ray_session):
    """IQR outlier composition (queries: iqr_outliers) vs DuckDB on
    sf0.001 — boundary bit-stability included."""
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    mine = sorted(r["event_id"] for r in
                  E.queries()["iqr_outliers"](sf).take_all())
    oracle = duckdb.sql(f"""
        SELECT event_id FROM read_parquet('{sf}/events.parquet')
        WHERE value > (SELECT quantile_disc(value, 0.75)
                           + 1.5 * (quantile_disc(value, 0.75)
                                    - quantile_disc(value, 0.25))
                       FROM read_parquet('{sf}/events.parquet'))
        """).fetchall()
    assert mine == sorted(e for (e,) in oracle)
    assert mine


def test_ntile_buckets_duckdb_parity(ray_session, events):
    import duckdb
    import ray.data as rd

    from osmium_tool_ray.pipelines.stats import ntile_buckets

    tbl = events
    for k in (4, 7):
        out = ntile_buckets(rd.from_arrow(tbl).repartition(5),
                            ["ival", "event_id"], k).take_all()
        mine = {r["event_id"]: r["bucket"] for r in out}
        want = dict(duckdb.sql(f"""
            SELECT event_id,
                   ntile({k}) OVER (ORDER BY ival, event_id)
            FROM tbl""").fetchall())
        assert mine == want


def test_ntile_more_buckets_than_rows(ray_session):
    import ray.data as rd

    from osmium_tool_ray.pipelines.stats import ntile_buckets

    tbl = pa.table({"v": pa.array([5, 1, 9], type=pa.int64()),
                    "id": pa.array([0, 1, 2], type=pa.int64())})
    out = ntile_buckets(rd.from_arrow(tbl), ["v", "id"], 10).take_all()
    got = {r["id"]: r["bucket"] for r in out}
    assert got == {1: 1, 0: 2, 2: 3}
