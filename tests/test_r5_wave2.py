"""Round-5 wave 2: discrete Frechet DP vs a scalar reference, plus the
space-time anomaly rule on a constructed profile."""

import numpy as np
import pyarrow as pa


def _frechet_scalar(track, ref):
    n, m = len(track), len(ref)
    F = np.full((n, m), -1.0)

    def d2(i, j):
        dx = track[i][0] - ref[j][0]
        dy = track[i][1] - ref[j][1]
        return dx * dx + dy * dy

    for i in range(n):
        for j in range(m):
            dij = d2(i, j)
            if i == 0 and j == 0:
                F[i, j] = dij
            elif i == 0:
                F[i, j] = max(F[0, j - 1], dij)
            elif j == 0:
                F[i, j] = max(F[i - 1, 0], dij)
            else:
                F[i, j] = max(min(F[i - 1, j], F[i - 1, j - 1],
                                  F[i, j - 1]), dij)
    return int(F[n - 1, m - 1])


def test_frechet_to_ref_matches_scalar(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.spatial import frechet_to_ref

    rng = np.random.default_rng(17)
    ref = rng.integers(-100, 100, (7, 2)).astype(np.int64)
    rows = []
    tracks = {}
    for uid in range(6):
        ln = int(rng.integers(1, 12))
        pts = rng.integers(-100, 100, (ln, 2)).astype(np.int64)
        tracks[uid] = pts
        for i, (x, y) in enumerate(pts):
            rows.append({"user_id": uid, "ts": 1_700_000_000_000_000
                         + i * 1_000_000, "tie": i,
                         "x": int(x), "y": int(y)})
    ds = rd.from_items(rows).map_batches(
        lambda b: pa.table({"user_id": b["user_id"],
                            "ts": b["ts"].cast(pa.timestamp("us")),
                            "tie": b["tie"], "x": b["x"], "y": b["y"]}),
        batch_format="pyarrow").repartition(3)
    out = {r["user_id"]: (r["frechet_d2"], r["n_points"])
           for r in frechet_to_ref(ds, "user_id", "ts", "tie",
                                   "x", "y", ref).take_all()}
    assert set(out) == set(tracks)
    for uid, pts in tracks.items():
        assert out[uid] == (_frechet_scalar(pts, ref), len(pts)), uid
    # frechet >= max(first, last) pointwise distances (coupling anchors)
    for uid, pts in tracks.items():
        d0 = int(((pts[0] - ref[0]) ** 2).sum())
        dn = int(((pts[-1] - ref[-1]) ** 2).sum())
        assert out[uid][0] >= max(d0, dn)


def test_space_time_anomaly_rule(ray_session):
    # a hand-built hourly profile: 23 quiet hours (n=2) + one spike
    from __ray_entry__ import q_space_time_anomalies  # noqa: F401 (import check)

    n = np.array([2] * 23 + [40], dtype=np.int64)
    S, Q = n.sum(), (n * n).sum()
    d = n * 24 - S
    keep = (d > 0) & (d * d > 4 * (24 * Q - S * S))
    assert keep.sum() == 1 and keep[-1]          # only the spike
    flat = np.full(24, 5, dtype=np.int64)        # flat profile: nothing
    S, Q = flat.sum(), (flat * flat).sum()
    d = flat * 24 - S
    assert ((d > 0) & (d * d > 4 * (24 * Q - S * S))).sum() == 0


def test_quantile_normalize_matches_pandas(ray_session):
    from __ray_entry__ import q_quantile_normalize_value

    sf = "/root/testdata/sf0.001"
    out = {r["event_id"]: r["pr"]
           for r in q_quantile_normalize_value(sf).take_all()}
    import pandas as pd
    import pyarrow.parquet as pq
    df = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "user_id", "value"]).to_pandas()
    df["vc"] = (df["value"] * 100).round().astype("int64")
    rnk = df.groupby("user_id")["vc"].rank(method="min")
    cnt = df.groupby("user_id")["vc"].transform("size")
    pr = ((rnk - 1) / (cnt - 1).clip(lower=1)).where(cnt > 1, 0.0)
    want = dict(zip(df["event_id"], pr))
    assert set(out) == set(want)
    for k in want:
        assert out[k] == want[k], k


def test_neighbor_cell_jaccard_brute(ray_session):
    from __ray_entry__ import q_neighbor_cell_jaccard

    sf = "/root/testdata/sf0.001"
    got = {(r["cell_x"], r["cell_y"], r["dir"]): (r["inter"], r["uni"])
           for r in q_neighbor_cell_jaccard(sf).take_all()}
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["event_id", "user_id"])
    eid = t["event_id"].to_numpy()
    uid = t["user_id"].to_numpy()
    n6 = 64
    lon = ((eid * 7919) % 36000) / 100.0 - 180.0
    lat = ((eid * 104729) % 17000) / 100.0 - 85.0
    cx = np.clip(np.floor((lon + 180) / 360 * n6).astype(int), 0, 63)
    cy = np.clip(np.floor((lat + 90) / 180 * n6).astype(int), 0, 63)
    users = {}
    for a, b, u in zip(cx, cy, uid):
        users.setdefault((a, b), set()).add(int(u))
    want = {}
    for (a, b), ua in users.items():
        for d, dx, dy in (("E", 1, 0), ("N", 0, 1)):
            ub = users.get((a + dx, b + dy))
            if ub is None:
                continue
            want[(a, b, d)] = (len(ua & ub), len(ua | ub))
    assert got == want


def test_compression_ratio_matches_zlib(ray_session):
    import zlib

    from __ray_entry__ import q_compression_ratio_docs

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: (r["raw_len"], r["comp_len"], r["ratio"])
           for r in q_compression_ratio_docs(sf).take_all()}
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    assert len(out) == t.num_rows
    for did, txt in zip(t["doc_id"].to_pylist()[:100],
                        t["text"].to_pylist()[:100]):
        raw = len(txt.encode())
        comp = len(zlib.compress(txt.encode(), 6))
        assert out[did] == (raw, comp, comp / max(raw, 1)), did
    # repetitive text compresses below ~0.5 on this corpus
    ratios = [v[2] for v in out.values() if v[0] > 100]
    assert ratios and max(ratios) < 1.0


def test_char_block_dedup_first_occurrence(ray_session):
    from __ray_entry__ import q_char_block_dedup

    sf = "/root/testdata/sf0.001"
    rows = q_char_block_dedup(sf).take_all()
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    blocks = {}
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for i in range(0, max(len(txt), 1), 64):
            b = txt[i:i + 64]
            if not b:
                continue
            key = (did, i // 64)
            cur = blocks.get(b)
            if cur is None or key < cur[0]:
                blocks[b] = (key, (cur[1] if cur else 0) + 1)
            else:
                blocks[b] = (cur[0], cur[1] + 1)
    want = {v[0]: v[1] for v in blocks.values()}
    got = {(r["doc_id"], r["blk"]): r["n_copies"] for r in rows}
    assert got == want


def test_returned_revenue_join_path_parity(ray_session):
    """broadcast path vs the forced hash-join path (broadcast_cap=0)
    on sf0.001 — identical top-20 rows."""
    import pyarrow.parquet as pq

    from osmium_tool_ray.pipelines.analytics import returned_revenue
    from osmium_tool_ray.sources.readers import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    lineitem = read_parquet_clean(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])
    orders = read_parquet_clean(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    customer = pq.read_table(f"{sf}/customer.parquet",
                             columns=["c_custkey", "c_name",
                                      "c_nationkey"])
    nation = pq.read_table(f"{sf}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    args = (lineitem, orders, customer, nation,
            np.datetime64("1996-01-01"), np.datetime64("1996-07-01"))

    def rows(ds):
        return [(r["c_custkey"], r["c_name"], r["n_name"],
                 r["revenue_c4"]) for r in ds.take_all()]

    broad = rows(returned_revenue(*args, k=20))
    joined = rows(returned_revenue(*args, k=20, broadcast_cap=0))
    assert len(broad) == 20
    assert broad == joined
    # revenue strictly ordered desc with custkey tiebreak
    revs = [(-r[3], r[0]) for r in broad]
    assert revs == sorted(revs)
