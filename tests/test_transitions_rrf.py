"""transition_counts (pipelines/windows) vs a DuckDB LEAD() oracle and
hand fixtures; global_rank + rrf_fuse (pipelines/stats) vs window-rank
SQL."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.stats import global_rank, rrf_fuse
from osmium_tool_ray.pipelines.windows import keyed_transition_counts


def test_transitions_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 3000
    tbl = pa.table({
        "k": pa.array(rng.integers(1, 50, n), type=pa.int64()),
        "ts": pa.array(rng.integers(0, 10**9, n),
                       type=pa.int64()).cast(pa.timestamp("us")),
        "tie": pa.array(np.arange(n), type=pa.int64()),
        "st": pa.array(np.char.add("s", rng.integers(0, 5, n).astype(str)),
                       type=pa.string()),
    })
    out = keyed_transition_counts(rd.from_arrow(tbl).repartition(7),
                            "k", "ts", "st", tie_col="tie")
    mine = {(r["k"], r["from_state"], r["to_state"]): r["n"]
            for r in out.take_all()}
    want = duckdb.sql("""
        SELECT k, f, t, COUNT(*) FROM (
            SELECT k, st AS f,
                   LEAD(st) OVER (PARTITION BY k ORDER BY ts, tie) AS t
            FROM tbl) WHERE t IS NOT NULL GROUP BY 1, 2, 3""").fetchall()
    assert mine == {(k, f, t): c for k, f, t, c in want}


def test_transitions_hand_fixture(ray_session):
    import ray.data as rd

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
        "ts": pa.array([10, 20, 30, 5, 6, 1],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "tie": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        "st": pa.array(["a", "b", "a", "x", "x", "z"]),
    })
    out = keyed_transition_counts(rd.from_arrow(t), "k", "ts", "st",
                            tie_col="tie")
    rows = {(r["k"], r["from_state"], r["to_state"]): r["n"]
            for r in out.take_all()}
    assert rows == {(1, "a", "b"): 1, (1, "b", "a"): 1, (2, "x", "x"): 1}


def test_transitions_ts_tie_ordered_by_tiebreak(ray_session):
    import ray.data as rd

    # equal timestamps: the tie column decides the sequence order
    t = pa.table({
        "k": pa.array([7, 7, 7], type=pa.int64()),
        "ts": pa.array([100, 100, 100],
                       type=pa.int64()).cast(pa.timestamp("us")),
        "tie": pa.array([3, 1, 2], type=pa.int64()),
        "st": pa.array(["c", "a", "b"]),
    })
    out = keyed_transition_counts(rd.from_arrow(t), "k", "ts", "st",
                            tie_col="tie")
    rows = {(r["from_state"], r["to_state"]) for r in out.take_all()}
    assert rows == {("a", "b"), ("b", "c")}


def test_global_rank_and_rrf_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    n = 4000
    tbl = pa.table({
        "id": pa.array(np.arange(n), type=pa.int64()),
        "a": pa.array(rng.integers(0, 500, n), type=pa.int64()),
        "b": pa.array(rng.integers(0, 500, n), type=pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(9)
    ra = global_rank(ds.select_columns(["id", "a"]), ["a", "id"],
                     descending=[True, False], out_col="ra") \
        .select_columns(["id", "ra"])
    rb = global_rank(ds.select_columns(["id", "b"]), ["b", "id"],
                     descending=[True, False], out_col="rb") \
        .select_columns(["id", "rb"])
    fused = rrf_fuse(ra, rb, "id", "ra", "rb", k=60)
    mine = {r["id"]: (r["ra"], r["rb"], r["rrf"])
            for r in fused.take_all()}
    want = duckdb.sql("""
        WITH ra AS (SELECT id, ROW_NUMBER() OVER
                        (ORDER BY a DESC, id) AS ra FROM tbl),
             rb AS (SELECT id, ROW_NUMBER() OVER
                        (ORDER BY b DESC, id) AS rb FROM tbl)
        SELECT ra.id, ra, rb, 1.0/(60 + ra) + 1.0/(60 + rb)
        FROM ra JOIN rb ON ra.id = rb.id""").fetchall()
    assert len(mine) == n
    for i, a_, b_, s in want:
        assert mine[i] == (a_, b_, s)


def test_global_rank_dense_ties_deterministic(ray_session):
    import ray.data as rd

    # all-equal sort key: the id tiebreak must yield ranks 1..n by id
    t = pa.table({"id": pa.array([5, 3, 1, 4, 2], type=pa.int64()),
                  "v": pa.array([9, 9, 9, 9, 9], type=pa.int64())})
    out = global_rank(rd.from_arrow(t).repartition(3), ["v", "id"],
                      descending=[True, False], out_col="r")
    got = {r["id"]: r["r"] for r in out.take_all()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
