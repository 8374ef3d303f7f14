"""Round-5 wave 22: RANGE-frame trailing sum, unpivot round-trip."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_trailing_24h_matches_pandas(ray_session):
    from __ray_entry__ import q_trailing_24h_sum_user

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts",
                                "value"]).to_pandas()
    df["vc"] = (df["value"] * 100).round().astype("int64")
    df["us"] = df["ts"].astype("int64")
    W = 24 * 3_600_000_000
    want = {}
    for uid, g in df.sort_values(["us", "event_id"]).groupby("user_id"):
        us = g["us"].to_numpy()
        vc = g["vc"].to_numpy()
        for i, (t, e) in enumerate(zip(us, g["event_id"])):
            m = (us >= t - W) & (us <= t)     # RANGE incl. ts peers
            want[e] = int(vc[m].sum())
    out = {r["event_id"]: r["sum_24h"]
           for r in q_trailing_24h_sum_user(SF).take_all()}
    assert out == want
    # frames really span multiple events somewhere
    single = {e: v for e, v in out.items()}
    df2 = dict(zip(df["event_id"], df["vc"]))
    assert any(single[e] != df2[e] for e in single)


def test_unpivot_roundtrip_identity(ray_session):
    from __ray_entry__ import q_unpivot_type_counts

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    want = df.groupby(["user_id", "event_type"]).size().to_dict()
    out = {(r["user_id"], r["event_type"]): r["n"]
           for r in q_unpivot_type_counts(SF).take_all()}
    assert out == want and len(out) > 0


def test_reorder_buffer_matches_pandas(ray_session):
    from __ray_entry__ import q_reorder_buffer_depth

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts"]) \
        .to_pandas()
    df["us"] = df["ts"].astype("int64")
    df["arr"] = (df["event_id"] * 2654435761) % 2147483648
    df = df.sort_values(["user_id", "arr", "event_id"])
    want = {}
    for uid, g in df.groupby("user_id"):
        wm = g["us"].cummax()
        want[uid] = int(((wm - g["us"]) // 1_000_000).max())
    out = {r["user_id"]: r["max_lateness_s"]
           for r in q_reorder_buffer_depth(SF).take_all()}
    assert out == want and len(out) > 0
    assert max(out.values()) > 0      # arrival order IS out of order


def test_hll_error_audit_bound(ray_session):
    from __ray_entry__ import q_hll_error_audit

    rows = q_hll_error_audit(SF).take_all()
    assert len(rows) > 0
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    want = df.groupby("user_id")["event_type"].nunique().to_dict()
    for r in rows:
        assert r["n_exact"] == want[r["user_id"]]
        assert r["abs_err"] == abs(r["n_exact"] - r["n_est"])
        # p=12 HLL on tiny cardinalities is near-exact
        assert r["abs_err"] <= max(1, r["n_exact"] // 5)


def test_conformal_interval_covers(ray_session):
    import math

    from __ray_entry__ import (q_conformal_interval_knn,
                               q_knn_regression)

    preds = {r["query_id"]: r["pred_c"]
             for r in q_knn_regression(SF).take_all()}
    vals = pq.read_table(f"{SF}/events.parquet",
                         columns=["event_id", "value"]).to_pandas()
    vc = dict(zip(vals["event_id"],
                  (vals["value"] * 100).round().astype("int64")))
    res = np.sort(np.asarray([abs(float(vc[q]) - p)
                              for q, p in preds.items()]))
    out = {r["q"]: r["radius"]
           for r in q_conformal_interval_knn(SF).to_pylist()}
    for q in (0.5, 0.9):
        assert out[q] == res[max(math.ceil(q * len(res)) - 1, 0)]
    # conformal coverage: >= 90% of calibration residuals fall inside
    assert (res <= out[0.9]).mean() >= 0.9


def test_dedup_keep_best_winner_rule(ray_session):
    from __ray_entry__ import q_dedup_keep_best, q_dup_clusters
    from osmium_tool_ray.sources.corpus import images_dataset

    SF1 = SF
    cc = {r["image_id"]: r["rep"]
          for r in q_dup_clusters(SF1).take_all()}
    imgs = images_dataset(SF1, columns=["image_id", "w", "h"]) \
        .take_all()
    quality = {r["image_id"]: r["w"] * r["h"] for r in imgs}
    from collections import defaultdict
    members = defaultdict(list)
    for r in imgs:
        rep = cc.get(r["image_id"], r["image_id"])
        members[rep].append(r["image_id"])
    out = {r["rep"]: (r["keep_id"], r["n_members"], r["best_quality"])
           for r in q_dedup_keep_best(SF1).take_all()}
    assert set(out) == set(members)
    total = 0
    for rep, (keep, n, bq) in out.items():
        ms = members[rep]
        total += n
        assert n == len(ms)
        best = sorted(ms, key=lambda i: (-quality[i], i))[0]
        assert keep == best and bq == quality[best], rep
    assert total == len(imgs)          # clusters partition the corpus


def test_bipartite_radius_join_paths_agree(ray_session):
    from __ray_entry__ import q_event_image_radius_join

    broad = sorted((r["event_id"], r["image_id"], r["d2"])
                   for r in q_event_image_radius_join(SF).take_all())
    joined = sorted((r["event_id"], r["image_id"], r["d2"])
                    for r in q_event_image_radius_join(
                        SF, probe_broadcast_cap=0).take_all())
    assert broad == joined and len(broad) > 0
    # pairs really cross datasets and respect the radius
    for e, i, d2 in broad:
        assert i.startswith("img") and d2 <= 300_000_000 ** 2


def test_learned_index_audit_matches_reference(ray_session):
    from __ray_entry__ import q_learned_index_audit

    k = np.sort(pq.read_table(f"{SF}/orders.parquet",
                              columns=["o_orderkey"])["o_orderkey"]
                .to_numpy())
    r = np.arange(1, len(k) + 1, dtype=np.int64)
    n = len(k)
    s_k, s_r = int(k.sum()), int(r.sum())
    s_kr, s_kk = int((k * r).sum()), int((k * k).sum())
    b = float(n * s_kr - s_k * s_r) / float(n * s_kk - s_k * s_k)
    a = (float(s_r) - b * float(s_k)) / float(n)
    err = np.abs(r.astype(float) - (a + b * k.astype(float))).max()
    out = q_learned_index_audit(SF).take_all()[0]
    assert out["n"] == n
    assert out["slope"] == b and out["intercept"] == a
    assert out["max_abs_err"] == err
    # the fit is useful: error window is a small fraction of the table
    assert err < n / 4


def test_choropleth_classes_balanced(ray_session):
    from collections import Counter

    from __ray_entry__ import q_choropleth_classes

    rows = q_choropleth_classes(SF).take_all()
    assert len(rows) > 0
    c = Counter(r["class"] for r in rows)
    assert set(c) == {1, 2, 3, 4, 5}
    assert max(c.values()) - min(c.values()) <= 1   # equal-count
    # classes are monotone in count: every class-5 cell >= class-1 cell
    by_class = {}
    for r in rows:
        by_class.setdefault(r["class"], []).append(r["n"])
    assert min(by_class[5]) >= max(by_class[1])


def test_brightness_trend_matches_numpy(ray_session):
    from __ray_entry__ import q_brightness_trend_by_cell
    from osmium_tool_ray.functions.imagecodec import decode_batch
    import pyarrow as pa

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts"]).to_pandas()
    eid = ev["event_id"].to_numpy()
    lon = ((eid * 7919) % 36000) / 100.0 - 180.0
    lat = ((eid * 104729) % 17000) / 100.0 - 85.0
    x = np.clip(np.floor((lon + 180.0) / 360.0 * 16), 0, 15) \
        .astype(np.int64)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * 16), 0, 15) \
        .astype(np.int64)
    month = (ev["ts"].astype("int64").to_numpy()
             // 86_400_000_000) // 30
    from osmium_tool_ray.sources.corpus import images_from_events_batch
    img = images_from_events_batch(
        pa.table({"event_id": pa.array(eid)}), True,
        ["image_id", "bytes"])
    pix, w, h = decode_batch(img["bytes"])
    bsum = pix.astype(np.int64).sum(axis=1)
    from collections import defaultdict
    monthly = defaultdict(int)
    for c, m, b in zip(x * 16 + y, month, bsum):
        monthly[(int(c), int(m))] += int(b)
    series = defaultdict(list)
    for (c, m), s in sorted(monthly.items()):
        series[c].append((m, s))
    want = {}
    for c, pts in series.items():
        xs = np.array([p[0] for p in pts], dtype=np.int64)
        ys = np.array([p[1] for p in pts], dtype=np.int64)
        n = len(xs)
        num = int(n * (xs * ys).sum() - xs.sum() * ys.sum())
        den = int(n * (xs * xs).sum() - xs.sum() ** 2)
        want[c] = (n, num, den)
    out = {r["cell_x"] * 16 + r["cell_y"]:
           (r["n_months"], r["slope_num"], r["slope_den"])
           for r in q_brightness_trend_by_cell(SF).take_all()}
    assert out == want and len(out) > 0


def test_caption_pixel_corr_moments_match(ray_session):
    from __ray_entry__ import q_caption_pixel_corr_moments

    r = q_caption_pixel_corr_moments(SF).take_all()[0]
    n_ev = pq.read_table(f"{SF}/events.parquet",
                         columns=["event_id"]).num_rows
    assert r["n"] == n_ev
    # captions are 'caption <id> <type>' = 3 tokens; pixels 16*16=256
    assert r["s_x"] == 3 * n_ev and r["s_y"] == 256 * n_ev
    assert r["s_xy"] == 3 * 256 * n_ev
    assert r["s_xx"] == 9 * n_ev and r["s_yy"] == 256 * 256 * n_ev
