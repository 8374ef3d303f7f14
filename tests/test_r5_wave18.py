"""Round-5 wave 18: order reconciliation (incl. planted mismatch),
sentence stats, churn labels."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_reconciliation_detects_planted_mismatch(ray_session,
                                                 tmp_path):
    import shutil

    from __ray_entry__ import q_order_reconciliation

    base = q_order_reconciliation(SF).take_all()[0]
    n_orders = pq.read_table(f"{SF}/orders.parquet",
                             columns=["o_orderkey"]).num_rows
    assert base["n_orders"] == n_orders

    # the synthetic headers never equal their line sums — every order
    # is flagged, which is exactly what the audit should report
    assert base["n_mismatched"] == n_orders
    assert base["max_abs_diff_c"] > 0

    d = tmp_path / "sf"
    d.mkdir()
    for t in ["orders", "lineitem"]:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    # plant a FIX: set one header total to exactly its line sum ->
    # the mismatch count must drop by one
    import pyarrow as pa
    li = pq.read_table(d / "lineitem.parquet",
                       columns=["l_orderkey",
                                "l_extendedprice"]).to_pandas()
    sums = (li["l_extendedprice"] * 100).round().astype("int64") \
        .groupby(li["l_orderkey"]).sum()
    o = pq.read_table(d / "orders.parquet")
    ok = o["o_orderkey"].to_numpy(zero_copy_only=False)
    tp = o["o_totalprice"].to_numpy(zero_copy_only=False).copy()
    tp[0] = sums[ok[0]] / 100.0
    o = o.set_column(o.schema.get_field_index("o_totalprice"),
                     "o_totalprice", pa.array(tp))
    pq.write_table(o, d / "orders.parquet")
    out = q_order_reconciliation(str(d)).take_all()[0]
    assert out["n_mismatched"] == base["n_mismatched"] - 1


def test_sentence_stats_match_reference(ray_session):
    import re

    from __ray_entry__ import q_sentence_stats_docs

    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    out = {r["doc_id"]: (r["n_sentences"], r["n_chars"])
           for r in q_sentence_stats_docs(SF).take_all()}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        terms = len(re.findall(r"[.!?]+", text))
        trail = bool(re.search(r"[.!?]+[^.!?]*[^.!?\s][^.!?]*$", text))
        want = 1 if terms == 0 else terms + int(trail)
        assert out[doc_id] == (want, len(text)), doc_id


def test_churn_labels_match_pandas(ray_session):
    from __ray_entry__ import q_churn_labels

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    df["us"] = df["ts"].astype("int64")
    last = df.groupby("user_id")["us"].max()
    gmax = int(last.max())
    want = {u: ((gmax - int(v)) // 86_400_000_000,
                int((gmax - int(v)) // 86_400_000_000 >= 14))
            for u, v in last.items()}
    out = {r["user_id"]: (r["days_inactive"], r["churned"])
           for r in q_churn_labels(SF).take_all()}
    assert out == want and len(out) > 0
