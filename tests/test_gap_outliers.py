"""gap_outliers (pipelines/windows.gap_outliers) vs a scalar reference:
per-key inter-arrival gaps above factor x median gap, quantile_cont
median interpolation, (ts, tie) ordering, keys with <2 points dropped."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.windows import gap_outliers


def _mk(k, us, t):
    ts = pa.array(np.asarray(us, dtype=np.int64), type=pa.int64()) \
        .cast(pa.timestamp("us"))
    return rd.from_arrow(pa.table({
        "k": pa.array(np.asarray(k, dtype=np.int64)), "ts": ts,
        "t": pa.array(np.asarray(t, dtype=np.int64))}))


def _brute(k, us, t, factor=3.0):
    out = []
    for key in np.unique(k):
        m = k == key
        o = np.lexsort((t[m], us[m]))
        u, tt = us[m][o], t[m][o]
        if len(u) < 2:
            continue
        gaps = np.diff(u)
        s = np.sort(gaps)
        n = len(s)
        med = s[(n - 1) // 2] + (s[n // 2] - s[(n - 1) // 2]) * 0.5
        for i, gp in enumerate(gaps):
            if gp > factor * med:
                out.append((int(key), int(tt[i + 1]), int(gp)))
    return sorted(out)


def test_gap_outliers_matches_scalar(ray_session):
    rng = np.random.default_rng(23)
    n = 700
    k = rng.integers(0, 20, n)
    us = rng.integers(0, 10**7, n)
    t = rng.permutation(n)
    got = gap_outliers(_mk(k, us, t).repartition(6), "k", "ts", "t") \
        .to_pandas()
    got_rows = sorted((int(r.k), int(r.t), int(r.gap_us))
                      for r in got.itertuples())
    assert got_rows == _brute(k, us, t)


def test_gap_outliers_planted_dropout(ray_session):
    # steady 1s heartbeat with one 60s dropout
    us = np.r_[np.arange(0, 30) * 10**6,
               np.array([90 * 10**6]),
               np.arange(91, 100) * 10**6]
    k = np.zeros(len(us))
    t = np.arange(len(us))
    got = gap_outliers(_mk(k, us, t), "k", "ts", "t").to_pandas()
    assert len(got) == 1
    assert got.iloc[0].gap_us == 61 * 10**6    # 90s - 29s
