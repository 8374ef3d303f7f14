"""trailing_window (pipelines/windows.trailing_window) vs a scalar
RANGE-window reference: per-event trailing count/sum with peer
semantics (equal timestamps all join the window), keys split across
blocks, heavy timestamp ties."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.windows import trailing_window


def _brute(k, us, vc, ids, w_us):
    out = {}
    for i in range(len(k)):
        m = (k == k[i]) & (us >= us[i] - w_us) & (us <= us[i])
        out[int(ids[i])] = (int(m.sum()), int(vc[m].sum()))
    return out


def test_trailing_window_matches_scalar(ray_session):
    rng = np.random.default_rng(43)
    n = 800
    k = rng.integers(0, 25, n)
    us = rng.integers(0, 5000, n) * 10**6     # many exact-ts peers
    v = rng.normal(size=n).round(2) * 1       # exact cents
    ids = np.arange(n)
    ts = pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "k": pa.array(k), "ts": ts, "v": pa.array(v),
        "i": pa.array(ids)})).repartition(7)
    got = trailing_window(ds, "k", "ts", "v", "i", 600) \
        .to_pandas().set_index("i")
    vc = np.round(v * 100).astype(np.int64)
    want = _brute(k, us, vc, ids, 600 * 10**6)
    assert len(got) == n
    for i, (cnt, sm) in want.items():
        assert (got.loc[i].n_win, got.loc[i].sum_win_c) == (cnt, sm), i


def test_trailing_window_peer_semantics(ray_session):
    # three events at the SAME instant: each sees all three (RANGE
    # peers), regardless of any tie order
    us = np.array([100, 100, 100, 100 + 700]) * 10**6
    ts = pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1]), "ts": ts,
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
        "i": pa.array([0, 1, 2, 3])}))
    got = trailing_window(ds, "k", "ts", "v", "i", 600) \
        .to_pandas().set_index("i")
    for i in (0, 1, 2):
        assert (got.loc[i].n_win, got.loc[i].sum_win_c) == (3, 600)
    assert (got.loc[3].n_win, got.loc[3].sum_win_c) == (1, 400)
