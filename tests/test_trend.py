"""Exact per-key regression slope (pipelines/analytics.trend_per_key)
vs numpy lstsq on random data, plus degenerate-denominator cases."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.analytics import trend_per_key


def _run(tbl):
    out = trend_per_key(rd.from_arrow(tbl), "k", "x", "y").to_pandas()
    return {int(r.k): (int(r.n), int(r.slope_num), int(r.slope_den))
            for r in out.itertuples()}


def test_slope_matches_numpy():
    rng = np.random.default_rng(5)
    ks, xs, ys = [], [], []
    for k in range(25):
        n = int(rng.integers(2, 40))
        x = rng.integers(0, 720, n)
        y = rng.integers(0, 1000, n)
        ks += [k] * n
        xs += x.tolist()
        ys += y.tolist()
    tbl = pa.table({"k": pa.array(ks, type=pa.int64()),
                    "x": pa.array(xs, type=pa.int64()),
                    "y": pa.array(ys, type=pa.int64())})
    got = _run(tbl)
    for k in range(25):
        m = np.array(ks) == k
        x, y = np.array(xs)[m], np.array(ys)[m]
        n, num, den = got[k]
        assert n == m.sum()
        # exact integer moments
        assert num == n * (x * y).sum() - x.sum() * y.sum()
        assert den == n * (x * x).sum() - x.sum() ** 2
        if den != 0:
            ref = np.polyfit(x.astype(float), y.astype(float), 1)[0]
            assert abs(num / den - ref) < 1e-8


def test_single_point_and_constant_x():
    tbl = pa.table({"k": pa.array([1, 2, 2, 2], type=pa.int64()),
                    "x": pa.array([5, 7, 7, 7], type=pa.int64()),
                    "y": pa.array([9, 1, 2, 3], type=pa.int64())})
    got = _run(tbl)
    assert got[1] == (1, 0, 0)       # single point: 0/0 (undefined slope)
    assert got[2][2] == 0            # constant x: denominator 0
