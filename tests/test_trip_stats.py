"""trip_stats_user fold semantics on a planted events table: gap-split
trip ids restart per user, boundary steps contribute no distance, and
squared-step sums are exact."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as E


def test_trip_stats_planted(ray_session, tmp_path):
    # choose event_ids with known lattice coords; user 1: two trips
    # (gap of 2h between eid 2 and 3); user 2: one single-point trip
    eid = np.array([0, 1, 2, 3, 4, 5], dtype=np.int64)
    users = np.array([1, 1, 1, 1, 1, 2], dtype=np.int64)
    base = 1_700_000_000 * 10**6
    h = 3600 * 10**6
    us = np.array([base, base + h // 2, base + h,
                   base + 4 * h,                      # 3h gap -> new trip
                   base + 4 * h + h // 2, base])
    ts = pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"event_id": eid, "ts": ts, "user_id": users,
                    "event_type": pa.array(["a"] * 6),
                    "value": pa.array(np.ones(6)),
                    "props": pa.array([""] * 6)})
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = E.queries()["trip_stats_user"](str(tmp_path)).to_pandas() \
        .sort_values(["user_id", "trip_id"]).reset_index(drop=True)

    xq = (eid * 7919) % 36000 - 18000
    yq = (eid * 104729) % 17000 - 8500
    d = lambda i, j: int((xq[i] - xq[j]) ** 2 + (yq[i] - yq[j]) ** 2)
    assert got.values.tolist() == [
        [1, 1, 3, d(1, 0) + d(2, 1)],
        [1, 2, 2, d(4, 3)],
        [2, 1, 1, 0],
    ]
