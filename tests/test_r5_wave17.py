"""Round-5 wave 17: OLS moments, DQ expectations, Markov stationary."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_regression_moments_solve_ols(ray_session):
    from __ray_entry__ import q_regression_moments

    r = q_regression_moments(SF).take_all()[0]
    # assemble the normal equations and solve — must equal numpy lstsq
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts", "value"]).to_pandas()
    eid = df["event_id"].to_numpy()
    ts = df["ts"].astype("int64").to_numpy()
    y = (df["value"] * 100).round().astype("int64").to_numpy()
    x1 = ((eid * 7919) % 36000) // 100 - 180
    x2 = ((eid * 104729) % 17000) // 100 - 85
    x3 = (ts // 3_600_000_000) % 24
    assert r["n"] == len(y)
    assert r["s_x1y"] == int((x1 * y).sum())
    assert r["s_x1x2"] == int((x1 * x2).sum())
    X = np.column_stack([np.ones(len(y)), x1, x2, x3]).astype(float)
    XtX = np.array([
        [r["n"], r["s_x1"], r["s_x2"], r["s_x3"]],
        [r["s_x1"], r["s_x1x1"], r["s_x1x2"], r["s_x1x3"]],
        [r["s_x2"], r["s_x1x2"], r["s_x2x2"], r["s_x2x3"]],
        [r["s_x3"], r["s_x1x3"], r["s_x2x3"], r["s_x3x3"]]],
        dtype=float)
    Xty = np.array([r["s_y"], r["s_x1y"], r["s_x2y"], r["s_x3y"]],
                   dtype=float)
    beta = np.linalg.solve(XtX, Xty)
    ref = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    assert np.allclose(beta, ref, rtol=1e-8)


def test_dq_expectations_clean_data(ray_session):
    from __ray_entry__ import q_dq_expectations

    out = {r["rule"]: (r["n_rows"], r["n_violations"])
           for r in q_dq_expectations(SF).take_all()}
    assert len(out) == 4
    n = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_quantity"]).num_rows
    for rule, (nr, nv) in out.items():
        assert nr == n
        assert nv == 0, rule        # testdata satisfies every rule


def test_markov_stationary_matches_eig(ray_session):
    from __ray_entry__ import q_markov_stationary_types

    rows = q_markov_stationary_types(SF).take_all()
    states = sorted(r["state"] for r in rows)
    pi = np.asarray([r["stationary_p"]
                     for r in sorted(rows, key=lambda r: r["state"])])
    assert abs(pi.sum() - 1.0) < 1e-12 and (pi > 0).all()
    # rebuild the chain and check pi P = pi via eigenvector
    import pandas as pd
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type",
                                "event_id"]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    C = pd.crosstab(df["event_type"],
                    df.groupby("user_id")["event_type"].shift(-1)) \
        .reindex(index=states, columns=states, fill_value=0).to_numpy()
    P = C / np.maximum(C.sum(axis=1, keepdims=True), 1)
    w, V = np.linalg.eig(P.T)
    top = np.real(V[:, np.argmax(np.real(w))])
    top = top / top.sum()
    assert np.allclose(pi, top, atol=1e-8)
    assert np.allclose(pi @ P, pi, atol=1e-10)
