"""mann_kendall_per_key (pipelines/stats) vs an O(n^2) scalar brute
force: exact S and qualifying-pair count over pairs ts_i < ts_j, with
heavy timestamp and value ties, keys split across Ray blocks, and
zero-pair keys (single point / all-one-timestamp) dropped."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.stats import mann_kendall_per_key


def _brute(k, ts, v):
    out = {}
    for key in np.unique(k):
        m = k == key
        t_, v_ = ts[m], v[m]
        s = npairs = 0
        for i in range(len(t_)):
            for j in range(len(t_)):
                if t_[i] < t_[j]:
                    npairs += 1
                    s += int(np.sign(v_[j] - v_[i]))
        if npairs:
            out[int(key)] = (s, npairs)
    return out


def test_mann_kendall_matches_brute_force(ray_session):
    rng = np.random.default_rng(5)
    n = 1200
    k = rng.integers(0, 30, n)
    ts = rng.integers(0, 40, n)          # many equal-ts pairs
    v = rng.integers(-4, 5, n).astype(np.float64)   # many value ties
    ds = rd.from_arrow(pa.table({"k": k, "ts": ts, "v": v})) \
        .repartition(9)
    got = mann_kendall_per_key(ds, "k", "ts", "v").to_pandas() \
        .set_index("k")
    want = _brute(k, ts, v)
    assert len(got) == len(want)
    for key, (s, npairs) in want.items():
        assert (got.loc[key].s_stat, got.loc[key].n_pairs) == (s, npairs)


def test_mann_kendall_drops_zero_pair_keys(ray_session):
    # key 1: single point; key 2: two points at the SAME ts; key 3: real
    tbl = pa.table({"k": [1, 2, 2, 3, 3, 3],
                    "ts": [0, 5, 5, 1, 2, 3],
                    "v": [1.0, 2.0, 9.0, 1.0, 3.0, 2.0]})
    got = mann_kendall_per_key(rd.from_arrow(tbl), "k", "ts", "v") \
        .to_pandas().set_index("k")
    assert sorted(got.index) == [3]
    # pairs: (1,3):+1 (1,2):+1 (3,2):-1 -> S=1, n_pairs=3
    assert (got.loc[3].s_stat, got.loc[3].n_pairs) == (1, 3)


def test_mann_kendall_monotonic_series(ray_session):
    n = 257          # crosses several merge levels incl. non-power-of-2
    tbl = pa.table({"k": np.zeros(n, np.int64),
                    "ts": np.arange(n),
                    "v": np.arange(n).astype(np.float64)})
    got = mann_kendall_per_key(rd.from_arrow(tbl), "k", "ts", "v") \
        .to_pandas()
    assert got.iloc[0].s_stat == n * (n - 1) // 2
    assert got.iloc[0].n_pairs == n * (n - 1) // 2
