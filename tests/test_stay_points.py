"""Stay-point detection (pipelines/windows.stay_points) vs an
independent pure-Python anchor scan."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.windows import stay_points

US = 1_000_000


def _ref_scan(ts, x, y, r2, min_dur):
    out, i, n = [], 0, len(ts)
    while i < n:
        end = i + 1
        while end < n and ((x[end] - x[i]) ** 2
                           + (y[end] - y[i]) ** 2) <= r2:
            end += 1
        if ts[end - 1] - ts[i] >= min_dur:
            out.append((ts[i], ts[end - 1], end - i,
                        int(sum(x[i:end])), int(sum(y[i:end]))))
            i = end
        else:
            i += 1
    return out


def _tracks(seed=13, users=20, n=60):
    rng = np.random.default_rng(seed)
    rows = {"u": [], "ts": [], "x": [], "y": []}
    for u in range(users):
        t = 1_700_000_000 * US
        px, py = 0, 0
        for _ in range(int(rng.integers(5, n))):
            t += int(rng.integers(30, 900)) * US
            if rng.random() < 0.6:            # dwell: small jitter
                px += int(rng.integers(-3, 4))
                py += int(rng.integers(-3, 4))
            else:                             # travel: big jump
                px += int(rng.integers(50, 200))
                py += int(rng.integers(50, 200))
            rows["u"].append(u)
            rows["ts"].append(t)
            rows["x"].append(px)
            rows["y"].append(py)
    return rows


def test_stay_points_match_reference():
    rows = _tracks()
    tbl = pa.table({"u": pa.array(rows["u"], type=pa.int64()),
                    "ts": pa.array(rows["ts"], type=pa.timestamp("us")),
                    "x": pa.array(rows["x"], type=pa.int64()),
                    "y": pa.array(rows["y"], type=pa.int64())})
    got = stay_points(rd.from_arrow(tbl).repartition(4), "u", "ts",
                      "x", "y", radius=10, min_dur_s=1200,
                      buckets=3).to_pandas()
    got_set = {(int(r.u), int(r.start_us), int(r.end_us), int(r.n_points),
                int(r.sum_x), int(r.sum_y)) for r in got.itertuples()}
    exp_set = set()
    u_arr = np.array(rows["u"])
    for u in np.unique(u_arr):
        m = u_arr == u
        ts = np.array(rows["ts"])[m]
        x = np.array(rows["x"])[m]
        y = np.array(rows["y"])[m]
        for s, e, n, sx, sy in _ref_scan(ts.tolist(), x.tolist(),
                                         y.tolist(), 100, 1200 * US):
            exp_set.add((int(u), int(s), int(e), n, sx, sy))
    assert got_set == exp_set
    assert len(got_set) > 10        # the fixture actually produces stays
