"""gap_fill (pipelines/windows.gap_fill) vs a scalar forward-fill
reference: regular grid per key from first to last observation, latest
obs at-or-before each grid point, larger tie wins at equal timestamps,
observations split across Ray blocks."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.windows import gap_fill


def _brute(df, step):
    out = []
    for k, g in df.groupby("k"):
        # dedup equal es keeping max tie
        g = g.sort_values(["es", "t"]).drop_duplicates("es", keep="last")
        es, v = g.es.to_numpy(), g.v.to_numpy()
        mn = -(-es.min() // step)
        mx = es.max() // step
        for m in range(mn, mx + 1):
            t = m * step
            i = np.searchsorted(es, t, side="right") - 1
            out.append((k, t, v[i]))
    return sorted(out)


def test_gap_fill_matches_scalar(ray_session):
    rng = np.random.default_rng(9)
    n = 600
    k = rng.integers(0, 25, n)
    es = rng.integers(0, 40_000, n)
    v = rng.normal(size=n)
    t = rng.permutation(n)
    ts = pa.array(es * 10**6, type=pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"k": pa.array(k), "ts": ts,
                    "v": pa.array(v), "t": pa.array(t)})
    got = gap_fill(rd.from_arrow(tbl).repartition(8),
                   "k", "ts", "v", 3600, "t").to_pandas()
    got_rows = sorted(map(tuple, got[["k", "grid_ts", "value"]]
                          .to_numpy()))
    want = _brute(pd.DataFrame({"k": k, "es": es, "v": v, "t": t}), 3600)
    assert len(got_rows) == len(want)
    for a, b in zip(got_rows, want):
        assert a[:2] == b[:2] and a[2] == b[2]


def test_gap_fill_equal_ts_tie_and_exact_grid_point(ray_session):
    # two obs at the SAME second: larger tie wins; one obs exactly ON a
    # grid point covers that grid point itself
    es = np.array([3600, 3600, 7200])
    v = np.array([1.0, 2.0, 9.0])
    t = np.array([0, 5, 1])
    ts = pa.array(es * 10**6, type=pa.int64()).cast(pa.timestamp("us"))
    tbl = pa.table({"k": pa.array([1, 1, 1]), "ts": ts,
                    "v": pa.array(v), "t": pa.array(t)})
    got = gap_fill(rd.from_arrow(tbl), "k", "ts", "v", 3600, "t") \
        .to_pandas().sort_values("grid_ts")
    assert got.grid_ts.tolist() == [3600, 7200]
    assert got.value.tolist() == [2.0, 9.0]


def test_gap_fill_single_obs_between_grid_points_is_empty(ray_session):
    ts = pa.array([5000 * 10**6], type=pa.int64()) \
        .cast(pa.timestamp("us"))
    tbl = pa.table({"k": pa.array([1]), "ts": ts,
                    "v": pa.array([1.0]), "t": pa.array([0])})
    got = gap_fill(rd.from_arrow(tbl), "k", "ts", "v", 3600, "t")
    assert got.count() == 0
