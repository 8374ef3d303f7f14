"""Round-5 wave 8: DBSCAN vs brute-force BFS, CSV round-trip,
partition-pruned read, k-anonymity audit."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _dbscan_brute(pts, eps2, min_pts):
    """Reference DBSCAN with MIN-label border resolution."""
    n = len(pts)
    nbrs = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1]
                                                 - pts[j][1]) ** 2
            if d2 <= eps2:
                nbrs[i].append(j)
                nbrs[j].append(i)
    core = [len(nb) >= min_pts - 1 and len(nb) > 0 for nb in nbrs]
    label = [-1] * n
    # components over cores (label = numeric min core id in component)
    seen = [False] * n
    for s in range(n):
        if not core[s] or seen[s]:
            continue
        comp, stack = [], [s]
        seen[s] = True
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if core[v] and not seen[v]:
                    seen[v] = True
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    kind = []
    for i in range(n):
        if core[i]:
            kind.append("core")
        else:
            cands = [label[j] for j in nbrs[i] if core[j]]
            if cands:
                label[i] = min(cands)
                kind.append("border")
            else:
                kind.append("noise")
    return label, kind


def test_dbscan_matches_brute_with_borders(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.spatial import dbscan_labels, radius_join

    rng = np.random.default_rng(7)
    # two dense blobs + sprinkled noise, coordinates on an int grid
    blob1 = rng.integers(0, 50, (25, 2))
    blob2 = rng.integers(500, 560, (30, 2))
    noise = np.array([[1000, 1000], [2000, 0], [0, 2000], [1500, 700]])
    pts = np.vstack([blob1, blob2, noise]).astype(np.int64)
    ds = rd.from_items([{"event_id": i, "xf": int(x), "yf": int(y)}
                        for i, (x, y) in enumerate(pts)]).repartition(3)
    pts_ds = ds.map_batches(
        lambda b: pa.table({"event_id": b["event_id"].cast(pa.int64()),
                            "xf": b["xf"], "yf": b["yf"]}),
        batch_format="pyarrow")
    eps = 40
    pairs = radius_join(pts_ds, "event_id", "xf", "yf", radius=eps)
    for min_pts in (2, 4, 8):
        out = dbscan_labels(pairs, pts_ds.select_columns(["event_id"]),
                            id_col="event_id", min_pts=min_pts)
        got = {r["event_id"]: (r["label"], r["kind"])
               for r in out.take_all()}
        wl, wk = _dbscan_brute([tuple(p) for p in pts], eps * eps,
                               min_pts)
        want = {i: (wl[i], wk[i]) for i in range(len(pts))}
        assert got == want, min_pts
    # sanity at min_pts=4: both kinds of labels present
    kinds = {v[1] for v in want.values()}
    assert "core" in kinds and "noise" in kinds


def test_dbscan_query_covers_all_events(ray_session):
    from __ray_entry__ import q_dbscan_points

    rows = q_dbscan_points(SF).take_all()
    n_events = pq.read_table(f"{SF}/events.parquet",
                             columns=["event_id"]).num_rows
    assert len(rows) == n_events
    for r in rows:
        if r["kind"] == "noise":
            assert r["label"] == -1
        else:
            assert r["label"] >= 0
    # min_pts=2: any point in a pair is core, so no borders exist
    assert all(r["kind"] != "border" for r in rows)
    assert any(r["kind"] == "core" for r in rows)


def test_csv_roundtrip_identity(ray_session):
    from __ray_entry__ import q_csv_roundtrip

    out = {r["event_id"]: (r["user_id"], r["value_c"])
           for r in q_csv_roundtrip(SF).take_all()}
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id",
                                "value"]).to_pandas()
    want = {e: (u, int(round(v * 100)))
            for e, u, v in zip(df["event_id"], df["user_id"],
                               df["value"])}
    assert out == want and len(out) > 0


def test_partitioned_write_prune_counts(ray_session):
    from __ray_entry__ import q_partitioned_write_prune

    out = q_partitioned_write_prune(SF).take_all()
    assert len(out) == 1
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    et = sorted(df["event_type"].unique())[0]
    sub = df[df["event_type"] == et]
    assert out[0]["event_type"] == et
    assert out[0]["n"] == len(sub)
    assert out[0]["sum_vc"] == int((sub["value"] * 100).round()
                                   .astype("int64").sum())


def test_k_anonymity_matches_pandas(ray_session):
    from __ray_entry__ import q_k_anonymity_docs

    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["lang", "source",
                                "n_chars"]).to_pandas()
    df["nb"] = df["n_chars"] // 100
    g = df.groupby(["lang", "source", "nb"]).size()
    out = q_k_anonymity_docs(SF).take_all()[0]
    assert out["n_classes"] == len(g)
    assert out["n_risky_classes"] == int((g < 5).sum())
    assert out["n_risky_docs"] == int(g[g < 5].sum())
    assert out["n_docs"] == len(df)
