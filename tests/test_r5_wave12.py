"""Round-5 wave 12: interval overlap pairs, contingency moments,
Lorenz deciles."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_interval_overlap_matches_brute(ray_session):
    from collections import defaultdict

    from __ray_entry__ import q_interval_overlap_pairs

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    df["us"] = df["ts"].astype("int64")
    df["day"] = df["us"] // 86_400_000_000
    iv = df.groupby(["user_id", "day"])["us"].agg(["min", "max"])
    by_day = defaultdict(list)
    for (u, d), r in iv.iterrows():
        by_day[d].append((u, r["min"], r["max"]))
    want = defaultdict(lambda: [0, 0])
    for d, items in by_day.items():
        items.sort()
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                ua, sa, ea = items[i]
                ub, sb, eb = items[j]
                ov = min(ea, eb) - max(sa, sb)
                if ov >= 0:
                    want[(ua, ub)][0] += 1
                    want[(ua, ub)][1] += int(ov)
    out = {(r["user_a"], r["user_b"]): [r["n_overlaps"],
                                        r["total_overlap_us"]]
           for r in q_interval_overlap_pairs(SF).take_all()}
    assert out == dict(want) and len(out) > 0


def test_contingency_totals_consistent(ray_session):
    from __ray_entry__ import q_contingency_dow_type

    rows = q_contingency_dow_type(SF).take_all()
    assert len(rows) > 0
    grand = rows[0]["grand_total"]
    assert sum(r["n"] for r in rows) == grand
    n_events = pq.read_table(f"{SF}/events.parquet",
                             columns=["event_id"]).num_rows
    assert grand == n_events
    # row/col totals really are marginals
    from collections import defaultdict
    rt, ct = defaultdict(int), defaultdict(int)
    for r in rows:
        rt[r["dow"]] += r["n"]
        ct[r["event_type"]] += r["n"]
    for r in rows:
        assert r["row_total"] == rt[r["dow"]]
        assert r["col_total"] == ct[r["event_type"]]


def test_lorenz_monotone_and_final_share_one(ray_session):
    from __ray_entry__ import q_lorenz_deciles

    rows = sorted(q_lorenz_deciles(SF).take_all(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["share"] for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 1.0
    # Lorenz curve lies under the diagonal (inequality exists)
    assert shares[0] < 0.1
