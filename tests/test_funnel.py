"""Ordered funnel analysis (pipelines/windows.funnel_counts) vs a DuckDB
progressive-min oracle, plus hand-built strictness cases."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import funnel_counts

US = 1_000_000


def _events_tbl(seed=2, users=30, per_user=25):
    rng = np.random.default_rng(seed)
    types = np.array(["view", "click", "purchase", "error"])
    rows = {"user_id": [], "ts": [], "event_type": [], "event_id": []}
    eid = 0
    for u in range(users):
        for i in range(int(rng.integers(1, per_user))):
            rows["user_id"].append(u)
            rows["ts"].append(1_700_000_000 * US
                              + int(rng.integers(0, 10_000)) * US)
            rows["event_type"].append(str(types[rng.integers(0, 4)]))
            rows["event_id"].append(eid)
            eid += 1
    return pa.table({"user_id": pa.array(rows["user_id"], type=pa.int64()),
                     "ts": pa.array(rows["ts"], type=pa.timestamp("us")),
                     "event_type": pa.array(rows["event_type"]),
                     "event_id": pa.array(rows["event_id"],
                                          type=pa.int64())})


def _oracle(tbl, steps):
    con = duckdb.connect()
    con.register("ev", tbl)
    prev, out = None, []
    for k, s in enumerate(steps, 1):
        if prev is None:
            q = (f"SELECT user_id, min(ts) AS t FROM ev "
                 f"WHERE event_type = '{s}' GROUP BY 1")
        else:
            q = (f"SELECT e.user_id, min(e.ts) AS t FROM ev e "
                 f"JOIN prev{k - 1} p ON e.user_id = p.user_id "
                 f"WHERE e.event_type = '{s}' AND e.ts > p.t GROUP BY 1")
        con.execute(f"CREATE TABLE prev{k} AS {q}")
        prev = k
        out.append((k, s,
                    con.execute(f"SELECT count(*) FROM prev{k}")
                    .fetchone()[0]))
    return out


def test_funnel_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _events_tbl()
    steps = ["view", "click", "purchase"]
    out = funnel_counts(rd.from_arrow(tbl).repartition(4), steps,
                        tie_col="event_id", buckets=5)
    mine = sorted((r["step"], r["event_type"], r["n_users"])
                  for r in out.take_all())
    assert mine == _oracle(tbl, steps)


def test_funnel_strict_ordering(ray_session):
    """click AT the same timestamp as view must NOT count (strict >),
    and an earlier click must not satisfy a later view."""
    import ray.data as rd

    t0 = 1_700_000_000 * US
    tbl = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3, 3], type=pa.int64()),
        "ts": pa.array([t0, t0,                 # u1: same-instant pair
                        t0 + US, t0,            # u2: click BEFORE view
                        t0, t0 + US],           # u3: proper order
                       type=pa.timestamp("us")),
        "event_type": pa.array(["view", "click",
                                "view", "click",
                                "view", "click"]),
        "event_id": pa.array(range(6), type=pa.int64()),
    })
    out = funnel_counts(rd.from_arrow(tbl), ["view", "click"],
                        tie_col="event_id", buckets=2)
    got = {r["step"]: r["n_users"] for r in out.take_all()}
    assert got == {1: 3, 2: 1}
