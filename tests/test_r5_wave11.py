"""Round-5 wave 11: RFM NTILE parity, user growth curve, PCA top
component."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ntile_matches_duckdb_rule(ray_session):
    import duckdb

    from __ray_entry__ import _ntile

    for n in (3, 5, 7, 150, 151, 154):
        rank = np.arange(1, n + 1, dtype=np.int64)
        want = duckdb.sql(
            f"SELECT NTILE(5) OVER (ORDER BY i) AS t FROM "
            f"range(1, {n + 1}) r(i) ORDER BY i").df()["t"].to_numpy()
        assert (_ntile(rank, n) == want).all(), n


def test_rfm_quintiles_balanced(ray_session):
    from collections import Counter

    from __ray_entry__ import q_rfm_segments

    rows = q_rfm_segments(SF).take_all()
    n = len(rows)
    assert n > 0
    for col in ("r_q", "f_q", "m_q"):
        c = Counter(r[col] for r in rows)
        assert set(c) == {1, 2, 3, 4, 5}
        assert max(c.values()) - min(c.values()) <= 1   # ANSI balance
    df = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_custkey", "o_totalprice"]).to_pandas()
    mon = (df["o_totalprice"] * 100).round().astype("int64") \
        .groupby(df["o_custkey"]).sum()
    got = {r["c_custkey"]: r["monetary_c"] for r in rows}
    assert got == mon.to_dict()


def test_user_growth_conserves_users(ray_session):
    from __ray_entry__ import q_user_growth_daily

    rows = sorted(q_user_growth_daily(SF).take_all(),
                  key=lambda r: r["day"])
    assert len(rows) > 0
    users = pq.read_table(f"{SF}/events.parquet",
                          columns=["user_id"])["user_id"].to_pylist()
    assert rows[-1]["total_users"] == len(set(users))
    run = 0
    for r in rows:
        run += r["new_users"]
        assert r["total_users"] == run


def test_pca_matches_numpy_eigh(ray_session):
    from __ray_entry__ import q_pca_top_embeddings

    rows = sorted(q_pca_top_embeddings(SF).take_all(),
                  key=lambda r: r["dim"])
    v = np.asarray([r["component"] for r in rows])
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"])["embedding"].to_pylist()
    X = np.rint(np.asarray(emb, dtype=np.float64) * 1e6)
    G = X.T @ X
    w, V = np.linalg.eigh(G)
    top = V[:, -1]
    if top[np.argmax(np.abs(top))] < 0:
        top = -top
    assert np.linalg.norm(v) == 1.0 or abs(np.linalg.norm(v) - 1) < 1e-12
    assert np.abs(v @ top) > 1 - 1e-9        # same direction
    assert abs(rows[0]["eigenvalue"] - w[-1] / 1e12) \
        < 1e-6 * abs(w[-1] / 1e12)
