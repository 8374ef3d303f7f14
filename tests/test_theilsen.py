"""theil_sen_per_key (pipelines/stats) vs a scalar all-pairs reference:
median of pairwise slopes over strictly-increasing-ts pairs, DuckDB
quantile_cont interpolation (lo + (hi-lo)*0.5), equal-ts pairs excluded,
robustness to planted outliers."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.stats import theil_sen_per_key


def _mk(k, us, v):
    ts = pa.array(np.asarray(us, dtype=np.int64), type=pa.int64()) \
        .cast(pa.timestamp("us"))
    return rd.from_arrow(pa.table({
        "k": pa.array(np.asarray(k, dtype=np.int64)), "ts": ts,
        "v": pa.array(np.asarray(v, dtype=np.float64))}))


def _brute(k, us, v):
    out = {}
    for key in np.unique(k):
        m = k == key
        u, vc = us[m], np.round(v[m] * 100).astype(np.int64)
        sl = []
        for i in range(len(u)):
            for j in range(len(u)):
                if u[i] < u[j]:
                    sl.append((vc[j] - vc[i]) / float(u[j] - u[i]))
        if not sl:
            continue
        s = np.sort(np.array(sl))
        n = len(s)
        lo, hi = s[(n - 1) // 2], s[n // 2]
        out[int(key)] = (lo + (hi - lo) * 0.5, n)
    return out


def test_theil_sen_matches_brute(ray_session):
    rng = np.random.default_rng(21)
    n = 500
    k = rng.integers(0, 15, n)
    us = rng.integers(0, 10_000, n) * 1000     # some equal-ts pairs
    v = rng.normal(size=n) * 5
    got = theil_sen_per_key(_mk(k, us, v).repartition(6),
                            "k", "ts", "v").to_pandas().set_index("k")
    want = _brute(k, us, v)
    assert len(got) == len(want)
    for key, (med, np_) in want.items():
        assert got.loc[key].n_pairs == np_
        assert got.loc[key].ts_slope == med, key


def test_theil_sen_robust_to_outliers(ray_session):
    # y = 2x (cents: 200x per unit ts) with 3 wild outliers: the median
    # slope stays exactly 200 cents per us-unit... use ts in us directly
    us = np.arange(30, dtype=np.int64)
    v = 2.0 * us
    v[[5, 17, 23]] = 1e4
    got = theil_sen_per_key(_mk(np.zeros(30), us, v), "k", "ts", "v") \
        .to_pandas()
    assert got.iloc[0].ts_slope == 200.0


def test_theil_sen_drops_all_equal_ts_keys(ray_session):
    got = theil_sen_per_key(
        _mk([1, 1, 2, 2], [7, 7, 1, 2], [1.0, 9.0, 0.0, 1.0]),
        "k", "ts", "v").to_pandas()
    assert sorted(got.k) == [2]
    assert got.iloc[0].ts_slope == 100.0
