"""Round-5 wave 19: label centroids / Fisher moments, column
cardinality profile."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_label_centroids_match_numpy(ray_session):
    from __ray_entry__ import q_label_centroids

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32) \
        .astype(np.float64)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    xs = emb * 1e6
    X = np.trunc(xs + np.copysign(0.5, xs)).astype(np.int64)
    out = {(r["label"], r["dim"]): (r["s_q"], r["s_qq"], r["n"])
           for r in q_label_centroids(SF).take_all()}
    for l in np.unique(lab):
        Xl = X[lab == l]
        for d in range(X.shape[1]):
            assert out[(l, d)] == (int(Xl[:, d].sum()),
                                   int((Xl[:, d] ** 2).sum()),
                                   len(Xl)), (l, d)
    # centroids are usable: within-class variance is non-negative
    for (l, d), (s, sq, n) in out.items():
        assert n * sq - s * s >= 0


def test_column_cardinality_matches_pandas(ray_session):
    from __ray_entry__ import q_column_cardinality_profile

    df = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    want = {
        "l_returnflag": df["l_returnflag"].nunique(),
        "l_linestatus": df["l_linestatus"].nunique(),
        "l_quantity": (df["l_quantity"] * 100).round().astype("int64")
        .nunique(),
        "l_suppkey": df["l_suppkey"].nunique(),
        "l_partkey": df["l_partkey"].nunique(),
    }
    out = {r["column_name"]: (r["n_distinct"], r["n_rows"])
           for r in q_column_cardinality_profile(SF).take_all()}
    assert {k: v[0] for k, v in out.items()} == want
    assert all(v[1] == len(df) for v in out.values())
    # low-cardinality flags are the dictionary-encoding candidates
    assert out["l_returnflag"][0] <= 3
