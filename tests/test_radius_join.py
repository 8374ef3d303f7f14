"""Exact within-radius spatial self-join (stages/spatial.radius_join)
vs brute force and the DuckDB 9-offset cell-join oracle; hot-cell
slicing exercised with a tiny pair_chunk."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.spatial import radius_join


def _pts(seed=53, n=400, span=1000):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n), type=pa.int64()),
        "x": pa.array(rng.integers(-span, span, n), type=pa.int64()),
        "y": pa.array(rng.integers(-span, span, n), type=pa.int64()),
    })


def _brute(tbl, r):
    x = tbl["x"].to_numpy()
    y = tbl["y"].to_numpy()
    ids = tbl["id"].to_numpy()
    out = {}
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    ai, bi = np.nonzero(np.triu(d2 <= r * r, k=1))
    for i, j in zip(ai, bi):
        a, b = sorted((int(ids[i]), int(ids[j])))
        out[(a, b)] = int(d2[i, j])
    return out


def test_radius_join_vs_bruteforce(ray_session):
    import ray.data as rd

    tbl = _pts()
    r = 120
    out = radius_join(rd.from_arrow(tbl).repartition(6), "id", "x", "y",
                      radius=r, coarse=5)
    mine = {(r_["a"], r_["b"]): r_["d2"] for r_ in out.take_all()}
    expect = _brute(tbl, r)
    assert mine == expect
    assert len(expect) > 20


def test_radius_join_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _pts(seed=54, n=300)
    r = 150
    out = radius_join(rd.from_arrow(tbl), "id", "x", "y", radius=r,
                      coarse=4)
    mine = {(x["a"], x["b"]): x["d2"] for x in out.take_all()}
    oracle = duckdb.sql(f"""
        WITH c AS (SELECT id, x, y, (x + 2147483648) // {r} AS cx,
                          (y + 2147483648) // {r} AS cy FROM tbl),
        n AS (SELECT id, x, y, cx + dx.o AS cx, cy + dy.o AS cy
              FROM c, (VALUES (-1),(0),(1)) dx(o),
                      (VALUES (-1),(0),(1)) dy(o))
        SELECT n.id, b.id, (n.x-b.x)*(n.x-b.x) + (n.y-b.y)*(n.y-b.y)
        FROM n JOIN c b ON b.cx = n.cx AND b.cy = n.cy AND n.id < b.id
        WHERE (n.x-b.x)*(n.x-b.x) + (n.y-b.y)*(n.y-b.y)
              <= {r}::BIGINT * {r}::BIGINT""").fetchall()
    assert mine == {(a, b): d for a, b, d in oracle}


def test_radius_join_hot_cell_chunked(ray_session):
    """One dense cell; pair_chunk far below the run's pair count forces
    many slices — results must still be exact and distinct."""
    import ray.data as rd

    rng = np.random.default_rng(55)
    n = 300
    tbl = pa.table({
        "id": pa.array(np.arange(n), type=pa.int64()),
        "x": pa.array(rng.integers(0, 50, n), type=pa.int64()),
        "y": pa.array(rng.integers(0, 50, n), type=pa.int64()),
    })
    r = 100   # everything within one radius -> ~n^2/2 pairs
    out = radius_join(rd.from_arrow(tbl), "id", "x", "y", radius=r,
                      coarse=3, pair_chunk=1000)
    rows = [(x["a"], x["b"]) for x in out.take_all()]
    assert len(rows) == len(set(rows)) == n * (n - 1) // 2


def test_radius_join_string_ids_and_boundary(ray_session):
    import ray.data as rd

    # exact boundary: distance == radius is INCLUDED; radius+1 excluded
    tbl = pa.table({
        "id": pa.array(["p1", "p2", "p3"]),
        "x": pa.array([0, 10, 21], type=pa.int64()),
        "y": pa.array([0, 0, 0], type=pa.int64()),
    })
    out = radius_join(rd.from_arrow(tbl), "id", "x", "y", radius=10,
                      coarse=2)
    rows = {(x["a"], x["b"]): x["d2"] for x in out.take_all()}
    assert rows == {("p1", "p2"): 100}
