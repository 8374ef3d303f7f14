"""Windowed keep-first dedup (pipelines/windows.window_dedup) vs a
DuckDB GROUP BY oracle."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import window_dedup

US = 1_000_000


def test_window_dedup_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)
    n = 600
    tbl = pa.table({
        "user_id": pa.array(rng.integers(0, 20, n), type=pa.int64()),
        "ts": pa.array((1_700_000_000 * US
                        + rng.integers(0, 10 * 86_400, n) * US)
                       .tolist(), type=pa.timestamp("us")),
    })
    out = window_dedup(rd.from_arrow(tbl).repartition(5),
                       "user_id", "ts", width_s=3600)
    mine = sorted((r["user_id"], r["window"], r["first_ts"],
                   r["n_events"]) for r in out.take_all())
    oracle = duckdb.sql("""
        SELECT user_id,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) * 3600
                   AS window,
               min(ts) AS first_ts,
               CAST(count(*) AS BIGINT) AS n_events
        FROM tbl GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    assert mine == [tuple(r) for r in oracle]
