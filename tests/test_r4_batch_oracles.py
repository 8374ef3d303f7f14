"""Driver-style oracle regression for the round-4 continuation batch:
every new exact-oracled query compared against its DuckDB twin at
sf0.001 (stringified canon — the check_contract compare — so dtype
drift fails loudly in pytest, not just in the driver)."""
import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"

BATCH = [
    "pii_redact_docs", "hex_bin_counts", "hausdorff_tracks",
    "mann_kendall_user", "theilsen_user", "changepoint_user",
    "gap_fill_user", "gap_outliers_user", "colocation_pairs",
    "sssp_weighted", "shipping_priority", "isochrone_cells",
    "dup_stats_by_source", "raster_equalize_cells", "adaptive_quadtree",
    "cell_change_detection", "gaussian_smooth_cells", "home_cells_user",
    "trailing_window_user", "quadkey_counts", "contrastive_negatives",
    "trip_stats_user", "region_density", "coverage_gaps",
    "langid_confusion", "extract_bounds", "decayed_value_user",
    "cell_distinct_users", "novelty_docs", "source_drift",
    "copresence_pairs", "burst_windows", "activity_span_user",
    "seasonality_dow", "order_price_quartiles", "mutual_nn_pairs",
    "fulfillment_lag_quartiles", "knn_regression", "dwell_time_user",
    "fence_crossings_user", "autocorr_user", "cell_diversity",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", BATCH)
def test_r4_query_matches_oracle(ray_session, con, name):
    res = E.queries()[name](SF)
    mine = _canon(res.to_pandas() if hasattr(res, "to_pandas")
                  else pd.DataFrame(res))
    want = _canon(con.execute(E.oracle_sql()[name]).fetchdf())
    assert len(mine) == len(want) > 0, name
    assert list(mine.columns) == list(want.columns), name
    assert mine.equals(want), name
