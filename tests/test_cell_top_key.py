"""Dominant key per grid cell (stages/tiles.cell_top_key) vs the DuckDB
QUALIFY ROW_NUMBER oracle, plus a hand fixture pinning the deterministic
tiebreak (count desc, key asc)."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.tiles import cell_top_key


def _pts(seed=31, n=3000, nkeys=5):
    rng = np.random.default_rng(seed)
    return pa.table({
        "lon": pa.array(rng.uniform(-180, 180, n)),
        "lat": pa.array(rng.uniform(-85, 85, n)),
        "k": pa.array(np.char.add("key", rng.integers(0, nkeys, n)
                                  .astype(str)), type=pa.string()),
    })


def test_cell_top_key_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _pts()
    level = 3
    out = cell_top_key(rd.from_arrow(tbl).repartition(7), level=level,
                       key_col="k", buckets=5)
    mine = {(r["cell_x"], r["cell_y"]): (r["k"], r["cnt"])
            for r in out.take_all()}
    nn, mm = 1 << level, (1 << level) - 1
    oracle = duckdb.sql(f"""
        WITH ck AS (
          SELECT LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 360.0 * {nn}) AS BIGINT), 0), {mm}) AS cell_x,
                 LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * {nn}) AS BIGINT), 0), {mm}) AS cell_y,
                 k, COUNT(*) AS cnt
          FROM tbl GROUP BY ALL)
        SELECT cell_x, cell_y, k, cnt FROM ck
        QUALIFY ROW_NUMBER() OVER (PARTITION BY cell_x, cell_y
                                   ORDER BY cnt DESC, k ASC) = 1
        """).fetchall()
    assert mine == {(x, y): (k, c) for x, y, k, c in oracle}
    assert len(mine) > 0


def test_cell_top_key_tiebreak(ray_session):
    import ray.data as rd

    # one cell, two keys with equal counts -> ascending key wins
    tbl = pa.table({
        "lon": pa.array([10.0] * 4),
        "lat": pa.array([10.0] * 4),
        "k": pa.array(["zebra", "apple", "zebra", "apple"]),
    })
    out = cell_top_key(rd.from_arrow(tbl), level=2, key_col="k", buckets=3)
    [row] = out.take_all()
    assert (row["k"], row["cnt"]) == ("apple", 2)


def test_cell_top_key_partials_distinct_before_shuffle(ray_session):
    """The in-batch partial must collapse each block to distinct
    (cell, key) pairs — the shuffle volume bound at 100 TB."""
    tbl = pa.table({
        "lon": pa.array([10.0] * 100 + [-10.0] * 50),
        "lat": pa.array([10.0] * 150),
        "k": pa.array(["a"] * 120 + ["b"] * 30),
    })
    import ray.data as rd
    out = cell_top_key(rd.from_arrow(tbl), level=2, key_col="k", buckets=2)
    rows = {(r["cell_x"], r["cell_y"]): (r["k"], r["cnt"])
            for r in out.take_all()}
    # east cell: 100x'a'; west cell: 20x'a'+30x'b'
    assert len(rows) == 2
    assert ("a", 100) in rows.values()
    assert ("b", 30) in rows.values()
