"""Round-5 wave 13: sweep-line peak concurrency, WoW change, funnel
latency quartiles."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_peak_concurrency_matches_sweep(ray_session):
    from __ray_entry__ import q_peak_concurrency

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    df["us"] = df["ts"].astype("int64")
    df["day"] = df["us"] // 86_400_000_000
    iv = df.groupby(["user_id", "day"])["us"].agg(["min", "max"])
    evs = sorted([(s, 0, 1) for s in iv["min"]]
                 + [(e, 1, -1) for e in iv["max"]])
    best, cur, at = -1, 0, None
    for us, kind, d in evs:
        cur += d
        if cur > best:
            best, at = cur, us
    out = q_peak_concurrency(SF).take_all()
    assert len(out) == 1
    assert (out[0]["peak_concurrency"], out[0]["at_us"]) == (best, at)
    assert best >= 2


def test_wow_change_matches_pandas(ray_session):
    from __ray_entry__ import q_wow_change_type

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    df["week"] = df["ts"].astype("int64") // 604_800_000_000
    cnt = df.groupby(["week", "event_type"]).size()
    want = {}
    for (w, t), n in cnt.items():
        p = cnt.get((w - 1, t))
        if p:
            want[(w, t)] = (n, p, 100.0 * float(n - p) / float(p))
    out = {(r["week"], r["event_type"]): (r["n"], r["prev_n"],
                                          r["pct_change"])
           for r in q_wow_change_type(SF).take_all()}
    assert out == want and len(out) > 0


def test_funnel_latency_matches_brute(ray_session):
    from __ray_entry__ import q_funnel_latency_quartiles

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type",
                                "event_id"]).to_pandas()
    df["us"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "us", "event_id"])
    lats = []
    for uid, g in df.groupby("user_id"):
        types = g["event_type"].to_numpy()
        us = g["us"].to_numpy()
        vpos = np.flatnonzero(types == "view")
        if len(vpos) == 0:
            continue
        cpos = np.flatnonzero((types == "click")
                              & (np.arange(len(g)) > vpos[0]))
        if len(cpos) == 0:
            continue
        lats.append(int(us[cpos[0]] - us[vpos[0]]))
    lats = np.sort(np.asarray(lats))
    out = {r["q"]: r["value"]
           for r in q_funnel_latency_quartiles(SF).to_pylist()}
    import math
    for q in (0.25, 0.5, 0.75):
        assert out[q] == int(lats[max(math.ceil(q * len(lats)) - 1, 0)])
