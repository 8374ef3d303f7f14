"""cusum_changepoint_per_key (pipelines/stats) vs a scalar CUSUM scan:
argmax |n*S_i - i*S_n| over splits 1..n-1 with smallest-index ties,
(ts, tie) ordering, single-point keys dropped, planted mean shift
recovered at the right index."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.stats import cusum_changepoint_per_key


def _mk(k, es, v, t):
    ts = pa.array(np.asarray(es) * 10**6, type=pa.int64()) \
        .cast(pa.timestamp("us"))
    return rd.from_arrow(pa.table({
        "k": pa.array(np.asarray(k, dtype=np.int64)), "ts": ts,
        "v": pa.array(np.asarray(v, dtype=np.float64)),
        "t": pa.array(np.asarray(t, dtype=np.int64))}))


def _brute(k, es, v, t):
    out = {}
    for key in np.unique(k):
        m = k == key
        o = np.lexsort((t[m], es[m]))
        vc = np.round(v[m][o] * 100).astype(np.int64)
        n = len(vc)
        if n < 2:
            continue
        s = np.cumsum(vc)
        i = np.arange(1, n)
        dd = np.abs(n * s[:-1] - i * s[-1])
        j = int(np.argmax(dd))          # first max = smallest index
        out[int(key)] = (j + 1, int(dd[j]))
    return out


def test_cusum_matches_scalar(ray_session):
    rng = np.random.default_rng(13)
    n = 800
    k = rng.integers(0, 20, n)
    es = rng.integers(0, 10_000, n)
    v = rng.normal(size=n) * 3
    t = rng.permutation(n)
    got = cusum_changepoint_per_key(_mk(k, es, v, t).repartition(7),
                                    "k", "ts", "v", "t") \
        .to_pandas().set_index("k")
    want = _brute(k, es, v.astype(np.float64), t)
    assert len(got) == len(want)
    for key, (cp, d) in want.items():
        assert (got.loc[key].cp_i, got.loc[key].d_stat) == (cp, d)


def test_cusum_recovers_planted_shift(ray_session):
    n = 120
    v = np.r_[np.zeros(40), np.full(80, 10.0)]
    got = cusum_changepoint_per_key(
        _mk(np.zeros(n), np.arange(n), v, np.arange(n)),
        "k", "ts", "v", "t").to_pandas()
    assert got.iloc[0].cp_i == 40


def test_cusum_drops_single_point_keys(ray_session):
    got = cusum_changepoint_per_key(
        _mk([1, 2, 2], [0, 0, 1], [1.0, 1.0, 5.0], [0, 1, 2]),
        "k", "ts", "v", "t").to_pandas()
    assert sorted(got.k) == [2]
