"""dtw_to_ref (stages/spatial.dtw_to_ref) vs a scalar DTW DP: exact
int64 alignment cost anchored at (0,0)-(n-1,m-1), keys split across Ray
blocks, Sakoe-Chiba band mode, identical-track zero cost."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.spatial import dtw_to_ref


def _scalar_dtw(x, y, rx, ry, band=None):
    n, m = len(x), len(rx)
    BIG = 1 << 60
    D = np.full((n, m), BIG, dtype=np.int64)
    for i in range(n):
        ctr = (i * m) // n
        for j in range(m):
            if band is not None and abs(j - ctr) > band:
                continue
            d = (x[i] - rx[j]) ** 2 + (y[i] - ry[j]) ** 2
            if i == 0 and j == 0:
                D[i, j] = d
            elif i == 0:
                D[i, j] = D[i, j - 1] + d
            elif j == 0:
                D[i, j] = D[i - 1, j] + d
            else:
                D[i, j] = min(D[i - 1, j], D[i - 1, j - 1],
                              D[i, j - 1]) + d
            D[i, j] = min(D[i, j], BIG)        # saturate like the fold
    return int(D[n - 1, m - 1])


def _mk(k, ts, t, x, y):
    tsa = pa.array(np.asarray(ts, dtype=np.int64) * 10**6,
                   type=pa.int64()).cast(pa.timestamp("us"))
    return rd.from_arrow(pa.table({
        "k": pa.array(np.asarray(k, dtype=np.int64)), "ts": tsa,
        "t": pa.array(np.asarray(t, dtype=np.int64)),
        "x": pa.array(np.asarray(x, dtype=np.int64)),
        "y": pa.array(np.asarray(y, dtype=np.int64))}))


def test_dtw_matches_scalar(ray_session):
    rng = np.random.default_rng(31)
    n = 400
    k = rng.integers(0, 15, n)
    ts = rng.permutation(n)
    x = rng.integers(-100, 100, n)
    y = rng.integers(-100, 100, n)
    rx = rng.integers(-100, 100, 9)
    ry = rng.integers(-100, 100, 9)
    got = dtw_to_ref(_mk(k, ts, np.arange(n), x, y).repartition(6),
                     "k", "ts", "t", "x", "y",
                     np.column_stack([rx, ry])).to_pandas().set_index("k")
    for key in np.unique(k):
        msk = k == key
        o = np.argsort(ts[msk])
        want = _scalar_dtw(x[msk][o], y[msk][o], rx, ry)
        assert got.loc[key].dtw_d2 == want, key
        assert got.loc[key].n_points == msk.sum()


def test_dtw_banded_matches_scalar(ray_session):
    rng = np.random.default_rng(37)
    n = 120
    k = rng.integers(0, 5, n)
    x = rng.integers(-50, 50, n)
    y = rng.integers(-50, 50, n)
    rx = rng.integers(-50, 50, 12)
    ry = rng.integers(-50, 50, 12)
    got = dtw_to_ref(_mk(k, np.arange(n), np.arange(n), x, y),
                     "k", "ts", "t", "x", "y",
                     np.column_stack([rx, ry]), band=3) \
        .to_pandas().set_index("k")
    for key in np.unique(k):
        msk = k == key
        o = np.argsort(np.arange(n)[msk])
        want = _scalar_dtw(x[msk][o], y[msk][o], rx, ry, band=3)
        assert got.loc[key].dtw_d2 == want, key


def test_dtw_identical_track_is_zero(ray_session):
    x = np.array([0, 10, 20, 30])
    y = np.array([1, 2, 3, 4])
    got = dtw_to_ref(_mk([5, 5, 5, 5], np.arange(4), np.arange(4), x, y),
                     "k", "ts", "t", "x", "y",
                     np.column_stack([x, y])).to_pandas()
    assert got.iloc[0].dtw_d2 == 0
