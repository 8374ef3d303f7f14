"""Rollup (grouping sets), pivot (wide aggregate) and JSON field
extraction vs DuckDB oracles on randomized fixtures."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.analytics import pivot_counts, rollup_counts
from osmium_tool_ray.stages.semistructured import JsonFieldExtract


def _tbl(seed=5, n=600):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr"])
    srcs = np.array(["a", "b", "c", "d"])
    return pa.table({
        "lang": pa.array(langs[rng.integers(0, 3, n)]),
        "source": pa.array(srcs[rng.integers(0, 4, n)]),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int64()),
    })


def test_rollup_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _tbl()
    out = rollup_counts(rd.from_arrow(tbl), ["lang", "source"], "v")
    mine = {(r["lang"], r["source"]): (r["n"], r["total"])
            for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT COALESCE(lang, 'ALL') AS lang,
               COALESCE(source, 'ALL') AS source,
               COUNT(*) AS n, SUM(v) AS total
        FROM tbl GROUP BY ROLLUP (lang, source)""").fetchall()
    assert mine == {(l, s): (n, t) for l, s, n, t in oracle}
    # all three levels present
    assert ("ALL", "ALL") in mine
    assert any(k[0] != "ALL" and k[1] == "ALL" for k in mine)
    assert any(k[1] != "ALL" for k in mine)


def test_pivot_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    cats = np.array(["click", "view", "purchase"])
    tbl = pa.table({
        "user_id": pa.array(rng.integers(1, 20, 800), type=pa.int64()),
        "event_type": pa.array(cats[rng.integers(0, 3, 800)]),
    })
    out = pivot_counts(rd.from_arrow(tbl), "user_id", "event_type",
                       ["click", "view", "purchase"])
    mine = {r["user_id"]: (r["n_click"], r["n_view"], r["n_purchase"])
            for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS c,
               COUNT(*) FILTER (event_type = 'view') AS v,
               COUNT(*) FILTER (event_type = 'purchase') AS p
        FROM tbl GROUP BY user_id""").fetchall()
    assert mine == {u: (c, v, p) for u, c, v, p in oracle}


def test_json_field_extract():
    batch = pa.table({"props": pa.array([
        '{"k": 87}', '{"k":0}', '{"k": -5, "j": 1}',
        '{"j": 3}',                 # key absent -> null
        '{"k" : 12}',               # spaced colon
    ])})
    out = JsonFieldExtract(props_col="props", key="k")(batch)
    assert out["k"].to_pylist() == [87, 0, -5, None, 12]
    assert out["k"].type == pa.int64()
