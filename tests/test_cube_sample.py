"""cube_counts single-shuffle CUBE and per_key_sample exact-k-per-key
vs DuckDB on random data."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.analytics import cube_counts
from osmium_tool_ray.pipelines.sampling import per_key_sample


def _tbl(seed=8, n=400):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "a": pa.array(rng.choice(["x", "y", "z"], n).tolist()),
        "b": pa.array(rng.choice(["p", "q"], n).tolist()),
        "v": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })


def test_cube_matches_duckdb():
    tbl = _tbl()
    got = cube_counts(rd.from_arrow(tbl).repartition(5), ["a", "b"], "v") \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(
        "SELECT COALESCE(a,'ALL') a, COALESCE(b,'ALL') b, "
        "CAST(count(*) AS BIGINT) n, CAST(SUM(v) AS BIGINT) total "
        "FROM t GROUP BY CUBE (a, b) ORDER BY a, b").fetch_df()
    assert got.equals(exp)


def test_per_key_sample_exact_k_and_stable():
    tbl = _tbl(seed=9, n=500)
    ds = rd.from_arrow(tbl).repartition(7)
    out = per_key_sample(ds, "id", "a", k=15).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute(
        "WITH r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a "
        "ORDER BY (id*2654435761)%2147483648, id) rk FROM t) "
        "SELECT id, a, b, v FROM r WHERE rk <= 15").fetch_df()
    got = out[["id", "a", "b", "v"]].sort_values("id") \
        .reset_index(drop=True)
    assert got.equals(exp.sort_values("id").reset_index(drop=True))
    assert (out.groupby("a").size() == 15).all()


def test_per_key_sample_small_key_keeps_all():
    tbl = pa.table({"id": pa.array([1, 2, 3], type=pa.int64()),
                    "k": pa.array(["a", "a", "b"])})
    out = per_key_sample(rd.from_arrow(tbl), "id", "k", k=10).to_pandas()
    assert sorted(out.id.tolist()) == [1, 2, 3]
