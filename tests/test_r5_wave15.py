"""Round-5 wave 15: exclusion funnel, segmented running max, dense
rank."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_clean_funnel_matches_pandas(ray_session):
    from __ray_entry__ import q_clean_funnel_counts

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type",
                                "event_id"]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    conv = clean = 0
    for uid, g in df.groupby("user_id"):
        types = g["event_type"].to_numpy()
        v = np.flatnonzero(types == "view")
        if len(v) == 0:
            continue
        c = np.flatnonzero((types == "click")
                           & (np.arange(len(g)) > v[0]))
        if len(c) == 0:
            continue
        conv += 1
        between = types[v[0] + 1:c[0]]
        if not (between == "error").any():
            clean += 1
    out = q_clean_funnel_counts(SF).take_all()[0]
    assert (out["n_converted"], out["n_clean"]) == (conv, clean)
    assert conv > 0 and clean <= conv


def test_running_max_matches_pandas(ray_session):
    from __ray_entry__ import q_running_max_user

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts",
                                "value"]).to_pandas()
    df["vc"] = (df["value"] * 100).round().astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["rm"] = df.groupby("user_id")["vc"].cummax()
    want = dict(zip(df["event_id"], zip(df["vc"], df["rm"])))
    out = {r["event_id"]: (r["vc"], r["running_max"])
           for r in q_running_max_user(SF).take_all()}
    assert out == want and len(out) > 0


def test_dense_rank_matches_pandas(ray_session):
    from __ray_entry__ import q_dense_rank_value

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    df["vc"] = (df["value"] * 100).round().astype("int64")
    df["dr"] = df["vc"].rank(method="dense").astype("int64")
    want = dict(zip(df["event_id"], zip(df["vc"], df["dr"])))
    out = {r["event_id"]: (r["vc"], r["dense_rank"])
           for r in q_dense_rank_value(SF).take_all()}
    assert out == want
    assert max(v[1] for v in out.values()) == df["vc"].nunique()
