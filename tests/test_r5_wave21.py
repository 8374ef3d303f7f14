"""Round-5 wave 21: type trigram motifs, 7-day last-touch
attribution."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _ordered(df):
    return df.sort_values(["user_id", "ts", "event_id"])


def test_trigrams_match_pandas(ray_session):
    from collections import Counter

    from __ray_entry__ import q_type_trigram_counts

    df = _ordered(pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"])
        .to_pandas())
    want = Counter()
    for uid, g in df.groupby("user_id"):
        t = g["event_type"].tolist()
        for i in range(len(t) - 2):
            want[f"{t[i]}>{t[i + 1]}>{t[i + 2]}"] += 1
    out = {r["motif"]: r["n"]
           for r in q_type_trigram_counts(SF).take_all()}
    assert out == dict(want) and len(out) > 0


def test_attribution_matches_pandas(ray_session):
    from __ray_entry__ import q_attribution_7d

    df = _ordered(pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"])
        .to_pandas())
    df["us"] = df["ts"].astype("int64")
    df["vc"] = (df["value"] * 100).round().astype("int64")
    WIN = 7 * 86_400_000_000
    want = {}
    for uid, g in df.groupby("user_id"):
        clicks = g[g["event_type"] == "click"]["us"].to_numpy()
        n = credit = 0
        for _, row in g[g["event_type"] == "purchase"].iterrows():
            prior = clicks[clicks < row["us"]]
            if len(prior) and row["us"] - prior.max() <= WIN:
                n += 1
                credit += int(row["vc"])
        if n:
            want[uid] = (n, credit)
    out = {r["user_id"]: (r["n_attributed"], r["credited_value_c"])
           for r in q_attribution_7d(SF).take_all()}
    assert out == want and len(out) > 0


def test_interleave_sources_fairness(ray_session):
    from __ray_entry__ import q_interleave_sources

    rows = sorted(q_interleave_sources(SF).take_all(),
                  key=lambda r: r["mix_order"])
    assert [r["mix_order"] for r in rows] == list(range(1, len(rows) + 1))
    # within any prefix the per-source counts differ by at most 1
    # while every source still has documents left
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["source"]).to_pandas()
    totals = df["source"].value_counts().to_dict()
    from collections import Counter
    seen = Counter()
    for r in rows:
        seen[r["source"]] += 1
        live = [s for s in totals if seen[s] < totals[s]]
        if live:
            mx = max(seen[s] for s in seen)
            mn = min(seen.get(s, 0) for s in totals
                     if totals[s] >= mx or s in live)
            # round-robin invariant: ranks in flight differ by <= 1
            assert r["rank_in_source"] >= mx - 1
    assert seen == totals
