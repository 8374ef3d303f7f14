"""transition_counts (OD matrix) and time_weighted_sum vs DuckDB
window-function oracles on random event data."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.windows import (time_weighted_sum,
                                               transition_counts)

US = 1_000_000


def _events(seed=3, n=900, users=25, states=6):
    rng = np.random.default_rng(seed)
    return pa.table({
        "u": pa.array(rng.integers(0, users, n).astype(np.int64)),
        "ts": pa.array((1_700_000_000 * US
                        + rng.integers(0, 5000, n) * US).astype(np.int64),
                       type=pa.timestamp("us")),
        "s": pa.array(rng.integers(0, states, n).astype(np.int64)),
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 50, n).astype(np.int64)),
    })


def test_transition_counts_match_duckdb():
    tbl = _events()
    got = transition_counts(rd.from_arrow(tbl).repartition(6), "u", "ts",
                            "s", tie_col="eid", buckets=4).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute("""
        WITH l AS (SELECT u, s, LAG(s) OVER (PARTITION BY u
                                             ORDER BY ts, eid) AS p
                   FROM t)
        SELECT p AS from_state, s AS to_state,
               CAST(count(*) AS BIGINT) AS n_trips
        FROM l WHERE p IS NOT NULL GROUP BY 1, 2
        ORDER BY 1, 2""").fetch_df()
    got = got.sort_values(["from_state", "to_state"]) \
        .reset_index(drop=True)
    assert got.equals(exp)


def test_time_weighted_sum_matches_duckdb():
    tbl = _events(seed=9)
    got = time_weighted_sum(rd.from_arrow(tbl).repartition(5), "u", "ts",
                            "v", tie_col="eid", buckets=3).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute("""
        WITH l AS (SELECT u, v, epoch_us(ts) AS t,
                          LEAD(epoch_us(ts)) OVER (PARTITION BY u
                              ORDER BY ts, eid) AS tn
                   FROM t)
        SELECT u, CAST(count(tn) AS BIGINT) AS n_segments,
               CAST(COALESCE(SUM((tn - t) * v), 0) AS BIGINT) AS tw_sum
        FROM l GROUP BY 1 ORDER BY u""").fetch_df()
    got = got.sort_values("u").reset_index(drop=True)
    assert got.equals(exp)
