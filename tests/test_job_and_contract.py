import json
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_extract_job_resume(ray_session, tmp_path):
    from osmium_tool_ray.jobs.extract_job import run_job

    cfg = {"extracts": [{"output": "west", "bbox": [-150, -60, -30, 60]},
                        {"output": "east", "bbox": [30, -60, 150, 60]}]}
    out = str(tmp_path / "run")
    m1 = run_job(cfg, SF, out, with_bytes=False)
    assert m1["partitions_written"] == ["west", "east"]
    m2 = run_job(cfg, SF, out, with_bytes=False)
    assert m2["partitions_skipped"] == ["west", "east"]
    # changing one region's geometry invalidates only that partition
    cfg["extracts"][1]["bbox"] = [30, -60, 151, 60]
    m3 = run_job(cfg, SF, out, with_bytes=False)
    assert m3["partitions_written"] == ["east"]
    assert m3["partitions_skipped"] == ["west"]
    lineage = [json.loads(l) for l in open(os.path.join(out, "lineage.jsonl"))]
    assert len(lineage) == 3


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


# a fast representative subset of the driver's oracle comparisons; the full
# sweep runs in the driver at sf0.01
CHECKED = ["extract_bbox", "extract_polygon", "cell_grid_counts", "fileinfo",
           "getid_semi", "sort_topk", "latest_version", "derive_changes_counts",
           "token_count_docs", "knn_points", "add_locations", "cat_clean"]


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(ray_session, oracle_con, name):
    import __ray_entry__ as E

    res = E.queries()[name](SF)
    if hasattr(res, "to_pandas"):
        mine = res.to_pandas()
    else:
        mine = res
    mine = _canon(mine if isinstance(mine, pd.DataFrame) else mine.to_pandas()) \
        if not isinstance(mine, pd.DataFrame) else _canon(mine)
    want = _canon(oracle_con.sql(E.oracle_sql()[name]).df())
    assert list(mine.columns) == list(want.columns)
    assert len(mine) == len(want)
    pd.testing.assert_frame_equal(mine, want, check_dtype=False, check_exact=True)
