"""Round-5 wave 20: hysteresis alert episodes vs a sequential state
machine, modularity moments."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_alert_episodes_match_state_machine(ray_session):
    from __ray_entry__ import q_alert_episodes_user

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts",
                                "value"]).to_pandas()
    df["vc"] = (df["value"] * 100).round().astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"])
    want = {}
    for uid, g in df.groupby("user_id"):
        armed, n = True, 0
        for v in g["vc"]:
            if armed and v >= 8000:
                n += 1
                armed = False
            elif not armed and v <= 2000:
                armed = True
        if n:
            want[uid] = n
    out = {r["user_id"]: r["n_episodes"]
           for r in q_alert_episodes_user(SF).take_all()}
    assert out == want and len(out) > 0
    # hysteresis matters: plain threshold-crossing counts differ
    plain = {}
    for uid, g in df.groupby("user_id"):
        v = g["vc"].to_numpy()
        plain[uid] = int(((v[1:] >= 8000) & (v[:-1] < 8000)).sum()
                         + (v[0] >= 8000))
    assert any(plain.get(u, 0) != n for u, n in want.items())


def test_community_moments_identities(ray_session):
    from __ray_entry__ import q_graph_community_moments

    rows = q_graph_community_moments(SF).take_all()
    assert len(rows) == 10
    m = rows[0]["m_edges"]
    # sum of community degrees = 2m; internal edges <= m
    assert sum(r["degree_sum"] for r in rows) == 2 * m
    assert sum(r["internal_edges"] for r in rows) <= m
    # modularity assembles from the moments and is a valid value
    q = sum(r["internal_edges"] / m - (r["degree_sum"] / (2 * m)) ** 2
            for r in rows)
    assert -1.0 <= q <= 1.0


def test_rate_limit_audit_matches_brute(ray_session):
    from __ray_entry__ import q_rate_limit_audit

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    df["us"] = df["ts"].astype("int64")
    W = 6 * 3_600_000_000
    want = {}
    for uid, g in df.groupby("user_id"):
        t = np.sort(g["us"].to_numpy())
        best = 0
        for i, ti in enumerate(t):
            best = max(best, int(((t >= ti - W) & (t <= ti)).sum()))
        want[uid] = best
    out = {r["user_id"]: r["max_in_window"]
           for r in q_rate_limit_audit(SF).take_all()}
    assert out == want and len(out) > 0
    assert max(out.values()) >= 2          # bursts exist in the data
