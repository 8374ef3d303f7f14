"""Round-5 wave 9: FK integrity audit (incl. a planted orphan),
assortativity moments, lag features."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_fk_audit_clean_schema_has_no_orphans(ray_session):
    from __ray_entry__ import q_fk_integrity_audit

    out = {r["edge"]: (r["n_rows"], r["n_orphans"])
           for r in q_fk_integrity_audit(SF).take_all()}
    assert len(out) == 7
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey"]).num_rows
    assert out["lineitem.l_orderkey"][0] == li
    for edge, (n, orph) in out.items():
        assert n > 0 and orph == 0, edge     # testdata is referentially clean


def test_fk_audit_detects_planted_orphan(ray_session, tmp_path):
    import shutil

    from __ray_entry__ import q_fk_integrity_audit

    # copy sf0.001 and delete one nation row -> customers/suppliers
    # referencing it become orphans
    d = tmp_path / "sf"
    d.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    nat = pq.read_table(d / "nation.parquet")
    gone = nat["n_nationkey"][0].as_py()
    pq.write_table(nat.slice(1), d / "nation.parquet")
    out = {r["edge"]: r["n_orphans"]
           for r in q_fk_integrity_audit(str(d)).take_all()}
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_nationkey"]).to_pandas()
    assert out["customer.c_nationkey"] == int(
        (cust["c_nationkey"] == gone).sum())
    assert out["lineitem.l_orderkey"] == 0     # untouched edges stay clean


def test_assortativity_matches_brute(ray_session):
    from collections import Counter

    from __ray_entry__ import q_assortativity_moments

    eid = pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id"])["event_id"].to_numpy()
    a = (eid * 7919) % 200
    b = (eid * 104729) % 200
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo != hi
    edges = set(zip(lo[keep].tolist(), hi[keep].tolist()))
    deg = Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    want = (len(edges),
            sum(deg[x] * deg[y] for x, y in edges),
            sum(deg[x] + deg[y] for x, y in edges),
            sum(deg[x] ** 2 + deg[y] ** 2 for x, y in edges))
    r = q_assortativity_moments(SF).take_all()[0]
    assert (r["n_edges"], r["sum_dadb"], r["sum_d"],
            r["sum_d2"]) == want


def test_lag_features_match_pandas(ray_session):
    from __ray_entry__ import q_lag_features_user

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts",
                                "value"]).to_pandas()
    df["vc"] = (df["value"] * 100).round().astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["prev"] = df.groupby("user_id")["vc"].shift(1)
    sub = df[df["prev"].notna()]
    want = {e: (v, int(p), v - int(p))
            for e, v, p in zip(sub["event_id"], sub["vc"],
                               sub["prev"])}
    out = {r["event_id"]: (r["vc"], r["vc_lag1"], r["delta"])
           for r in q_lag_features_user(SF).take_all()}
    assert out == want and len(out) > 0


def test_fk_audit_forced_bucketed_path(ray_session):
    """broadcast_cap=0 forces every edge through semi_join_bucketed —
    results must match the broadcast path exactly."""
    from __ray_entry__ import q_fk_integrity_audit

    broad = {r["edge"]: (r["n_rows"], r["n_orphans"])
             for r in q_fk_integrity_audit(SF).take_all()}
    bucketed = {r["edge"]: (r["n_rows"], r["n_orphans"])
                for r in q_fk_integrity_audit(
                    SF, broadcast_cap=0).take_all()}
    assert broad == bucketed and len(bucketed) == 7


def test_assortativity_forced_bucketed_path(ray_session):
    """Both degree-attach paths must agree; the brute test already
    pins the broadcast path, so force the bucketed one by patching
    the cap through a direct call path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.blocks import attach_lookup_bucketed
    from ray.data.aggregate import Sum

    # tiny 4-node graph, checked by hand
    edges = [(0, 1), (1, 2), (2, 3), (0, 2)]
    dedup = rd.from_items([{"a": a, "b": b} for a, b in edges]) \
        .map_batches(lambda t: pa.table({
            "a": t["a"].cast(pa.int64()),
            "b": t["b"].cast(pa.int64())}), batch_format="pyarrow") \
        .materialize()
    deg = dedup.map_batches(
        lambda t: pa.table({
            "node": pa.array(np.concatenate([
                t["a"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False)])),
            "deg": pa.array(np.ones(2 * t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("deg", alias_name="deg")) \
        .materialize()
    flagged = attach_lookup_bucketed(
        attach_lookup_bucketed(dedup, deg, "a", "deg", "da",
                               lookup_key="node"),
        deg, "b", "deg", "db", lookup_key="node")
    got = {(r["a"], r["b"]): (r["da"], r["db"])
           for r in flagged.take_all()}
    want_deg = {0: 2, 1: 2, 2: 3, 3: 1}
    assert got == {(a, b): (want_deg[a], want_deg[b])
                   for a, b in edges}
