"""Round-5 wave 4: region-overlap matrix, watermark/late-data windows,
monthly promo trend, supplier share-of-nation."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_region_overlap_matches_brute(ray_session):
    from __ray_entry__ import OVERLAP_BOXES, q_region_overlap_counts
    from osmium_tool_ray.sources.corpus import images_dataset

    pts = images_dataset(SF, columns=["lon", "lat"]).take_all()
    lon = np.asarray([r["lon"] for r in pts])
    lat = np.asarray([r["lat"] for r in pts])
    masks = []
    for (x0, y0, x1, y1) in OVERLAP_BOXES:
        masks.append((lon >= x0) & (lon <= x1) & (lat >= y0)
                     & (lat <= y1))
    want = {}
    for i in range(len(masks)):
        for j in range(i + 1, len(masks)):
            n = int((masks[i] & masks[j]).sum())
            if n:
                want[(f"r{i}", f"r{j}")] = n
    out = {(r["region_a"], r["region_b"]): r["n_both"]
           for r in q_region_overlap_counts(SF).take_all()}
    assert out == want and len(out) > 0


def test_late_data_windows_conservation(ray_session):
    from __ray_entry__ import q_late_data_windows

    rows = q_late_data_windows(SF).take_all()
    assert len(rows) > 0
    total = sum(r["n_on_time"] + r["n_late_accepted"] + r["n_dropped"]
                for r in rows)
    n_events = pq.read_table(f"{SF}/events.parquet",
                             columns=["event_id"]).num_rows
    assert total == n_events          # every event lands in one bucket
    # window alignment: starts are hour-aligned
    for r in rows:
        assert r["window_start_us"] % 3_600_000_000 == 0


def test_promo_trend_months_sum_to_q14(ray_session):
    from __ray_entry__ import q_promo_revenue, q_promo_trend_monthly

    trend = q_promo_trend_monthly(SF).take_all()
    assert 1 <= len(trend) <= 12
    for r in trend:
        assert 199601 <= r["month"] <= 199612
        assert 0 <= r["promo_c4"] <= r["total_c4"]
    jan = [r for r in trend if r["month"] == 199601]
    q14 = q_promo_revenue(SF).take_all()[0]    # same window: 1996-01
    assert jan and jan[0]["promo_c4"] == q14["promo_c4"]
    assert jan[0]["total_c4"] == q14["total_c4"]


def test_supplier_share_sums_to_one_per_nation(ray_session):
    from collections import defaultdict

    from __ray_entry__ import q_supplier_share_of_nation

    rows = q_supplier_share_of_nation(SF).take_all()
    assert len(rows) > 0
    by_nation = defaultdict(lambda: [0, 0])
    for r in rows:
        assert r["revenue_c4"] <= r["nation_revenue_c4"]
        by_nation[r["n_name"]][0] += r["revenue_c4"]
        nt = by_nation[r["n_name"]]
        nt[1] = r["nation_revenue_c4"]
    for name, (s, tot) in by_nation.items():
        assert s == tot, name          # shares partition the nation total


def test_wave4_sf0001_nonempty(ray_session):
    import __ray_entry__ as E

    for name in ["region_overlap_counts", "late_data_windows",
                 "promo_trend_monthly", "supplier_share_of_nation"]:
        assert E.queries()[name](SF).count() > 0, name
