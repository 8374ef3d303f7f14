"""map_match_viterbi (stages/spatial.map_match_viterbi) vs a per-key
scalar Viterbi DP: constant-switch-penalty HMM map matching with
clamped-projection emission distances, stay-on-tie transitions, and
first-index argmin ties — keys split across Ray blocks."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.spatial import map_match_viterbi


def _emit(x, y, seg):
    ax, ay, bx, by = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    px = x[:, None] - ax[None, :]
    py = y[:, None] - ay[None, :]
    with np.errstate(invalid="ignore", divide="ignore"):
        t = (px * dx[None, :] + py * dy[None, :]) / len2[None, :]
    t = np.nan_to_num(t, nan=0.0)
    np.clip(t, 0.0, 1.0, out=t)
    ex = px - t * dx[None, :]
    ey = py - t * dy[None, :]
    return ex * ex + ey * ey


def _scalar_viterbi(x, y, seg, pen):
    D = _emit(np.asarray(x, float), np.asarray(y, float), seg)
    n, S = D.shape
    cost = D.copy()
    back = np.zeros((n, S), dtype=np.int64)
    back[0] = np.arange(S)
    for i in range(1, n):
        for c in range(S):
            # full transition scan (the O(S^2) textbook form)
            best, barg = cost[i - 1, c], c          # stay wins ties
            for c2 in range(S):
                v = cost[i - 1, c2] + (pen if c2 != c else 0.0)
                if v < best:
                    best, barg = v, c2
            cost[i, c] = D[i, c] + best
            back[i, c] = barg
    sel = np.empty(n, dtype=np.int64)
    sel[-1] = int(np.argmin(cost[-1]))
    for i in range(n - 1, 0, -1):
        sel[i - 1] = back[i, sel[i]]
    return sel


def test_map_match_matches_scalar_viterbi(ray_session):
    rng = np.random.default_rng(29)
    seg = rng.uniform(-100, 100, (6, 4))
    n = 300
    k = rng.integers(0, 12, n)
    ts = rng.integers(0, 10**6, n)
    x = rng.uniform(-100, 100, n)
    y = rng.uniform(-100, 100, n)
    tie = np.arange(n)
    tspa = pa.array(ts * 10**6, type=pa.int64()).cast(pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "k": pa.array(k), "ts": tspa, "t": pa.array(tie),
        "x": pa.array(x), "y": pa.array(y)})).repartition(5)
    got = map_match_viterbi(ds, "k", "ts", "t", "x", "y", seg,
                            np.arange(6), penalty=500.0).to_pandas()
    got = got.set_index("t")
    for key in np.unique(k):
        m = k == key
        o = np.lexsort((tie[m], ts[m]))
        want = _scalar_viterbi(x[m][o], y[m][o], seg, 500.0)
        for i, tid in enumerate(tie[m][o]):
            assert got.loc[tid].seg_id == want[i], (key, i)


def test_map_match_prefers_staying_under_high_penalty(ray_session):
    # two far-apart segments; points alternate near each: with a huge
    # penalty the whole track sticks to ONE segment (the overall best)
    seg = np.array([[0, 0, 0, 10], [1000, 0, 1000, 10]], dtype=float)
    x = np.array([1.0, 999.0, 1.0, 999.0])
    y = np.array([5.0, 5.0, 5.0, 5.0])
    ts = pa.array(np.arange(4) * 10**6, type=pa.int64()) \
        .cast(pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1]), "ts": ts,
        "t": pa.array(np.arange(4)),
        "x": pa.array(x), "y": pa.array(y)}))
    got = map_match_viterbi(ds, "k", "ts", "t", "x", "y", seg,
                            np.array([0, 1]), penalty=1e9) \
        .to_pandas().sort_values("t")
    assert len(set(got.seg_id)) == 1
    # with zero penalty every point snaps to its nearest segment
    got0 = map_match_viterbi(ds, "k", "ts", "t", "x", "y", seg,
                             np.array([0, 1]), penalty=0.0) \
        .to_pandas().sort_values("t")
    assert got0.seg_id.tolist() == [0, 1, 0, 1]
