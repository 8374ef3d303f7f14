"""Group-wise top-k (pipelines/merge.topk_per_key) vs the DuckDB
row_number() window, including map-side pruning correctness across
partitionings and k larger than some groups."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.merge import topk_per_key


def _tbl(seed=5, n=800, keys=12):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(range(n), type=pa.int64()),
        "k": pa.array(rng.integers(0, keys, n), type=pa.int64()),
        "score": pa.array(rng.integers(0, 10_000, n), type=pa.int64()),
    })


def test_topk_per_key_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _tbl()
    out = topk_per_key(rd.from_arrow(tbl).repartition(7),
                       ["k"], ["score", "id"], 3)
    mine = sorted((r["k"], r["score"], r["id"]) for r in out.take_all())
    oracle = duckdb.sql("""
        SELECT k, score, id FROM (
            SELECT *, row_number() OVER (PARTITION BY k
                      ORDER BY score DESC, id DESC) AS rn
            FROM tbl) WHERE rn <= 3""").fetchall()
    assert mine == sorted(oracle)


def test_topk_per_key_small_groups(ray_session):
    """k exceeding a group's size returns the whole group; k=1 matches
    argmax_rows."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import argmax_rows

    tbl = pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "score": pa.array([5, 9, 4], type=pa.int64()),
    })
    out = topk_per_key(rd.from_arrow(tbl), ["k"], ["score", "id"], 10)
    assert out.count() == 3
    top1 = sorted((r["k"], r["id"]) for r in topk_per_key(
        rd.from_arrow(tbl), ["k"], ["score", "id"], 1).take_all())
    am = sorted((r["k"], r["id"]) for r in argmax_rows(
        rd.from_arrow(tbl), ["k"], ["score", "id"]).take_all())
    assert top1 == am == [(1, 2), (2, 3)]
