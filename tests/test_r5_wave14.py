"""Round-5 wave 14: catalog sweep, histogram-intersection similarity,
freshness audit."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_catalog_matches_files(ray_session):
    from __ray_entry__ import q_catalog_tables

    out = {r["table_name"]: (r["n_rows"], r["n_cols"])
           for r in q_catalog_tables(SF).take_all()}
    assert len(out) == 10
    for t, (nr, nc) in out.items():
        f = pq.ParquetFile(f"{SF}/{t}.parquet")
        assert (nr, nc) == (f.metadata.num_rows,
                            f.metadata.num_columns), t


def test_histogram_overlap_bounds_and_self_consistency(ray_session):
    from __ray_entry__ import q_type_histogram_overlap

    rows = q_type_histogram_overlap(SF).take_all()
    assert len(rows) == 10               # C(5,2) pairs, all present
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["inter"] <= min(r["n_a"], r["n_b"])
    # brute-force one pair
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    df["bin"] = (df["value"] * 100).round().astype("int64") // 100
    a, b = rows[0]["type_a"], rows[0]["type_b"]
    ha = df[df["event_type"] == a].groupby("bin").size()
    hb = df[df["event_type"] == b].groupby("bin").size()
    inter = sum(min(ha[k], hb[k]) for k in ha.index if k in hb.index)
    assert rows[0]["inter"] == inter


def test_freshness_global_max_is_zero_stale(ray_session):
    from __ray_entry__ import q_freshness_by_type

    rows = q_freshness_by_type(SF).take_all()
    assert len(rows) == 5
    assert min(r["staleness_s"] for r in rows) == 0
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    want = df.groupby("event_type")["ts"].max().astype("int64")
    got = {r["event_type"]: r["last_us"] for r in rows}
    assert got == want.to_dict()
