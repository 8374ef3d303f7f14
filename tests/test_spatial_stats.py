"""Moran's I + Getis-Ord Gi* (stages/raster) vs brute-force numpy and
hand fixtures, and the skyline operator (pipelines/stats.skyline) vs a
brute-force dominance scan."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.stats import _skyline_keep, skyline
from osmium_tool_ray.stages.raster import getis_gi_cells, moran_i


def _brute_moran(xs, ys, counts):
    """Textbook Moran's I over in-set cells, queen adjacency."""
    pts = {(int(a), int(b)): int(c) for a, b, c in zip(xs, ys, counts)}
    keys = sorted(pts)
    x = np.array([pts[k] for k in keys], dtype=np.float64)
    m = x.mean()
    num = 0.0
    w = 0
    for i, (a, b) in enumerate(keys):
        for da in (-1, 0, 1):
            for db in (-1, 0, 1):
                if da == db == 0:
                    continue
                j = pts.get((a + da, b + db))
                if j is None:
                    continue
                w += 1
                num += (x[i] - m) * (j - m)
    den = ((x - m) ** 2).sum()
    return len(keys), w, len(keys) / w * num / den


def _cells_ds(rd, xs, ys, counts, level):
    """Points dataset whose cell grid at `level` reproduces the given
    sparse (x, y, count) raster: place `count` points at each cell's
    center."""
    n = 1 << level
    lon, lat = [], []
    for a, b, c in zip(xs, ys, counts):
        lon += [(a + 0.5) / n * 360.0 - 180.0] * c
        lat += [(b + 0.5) / n * 180.0 - 90.0] * c
    t = pa.table({"lon": pa.array(lon, type=pa.float64()),
                  "lat": pa.array(lat, type=pa.float64())})
    return rd.from_arrow(t).repartition(5)


def test_moran_vs_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(41)
    n_cells = 60
    xs = rng.integers(3, 40, n_cells)
    ys = rng.integers(3, 40, n_cells)
    key = xs * 1000 + ys
    _, idx = np.unique(key, return_index=True)
    xs, ys = xs[idx], ys[idx]
    counts = rng.integers(1, 9, len(xs))
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    row = moran_i(ds, level=6).take_all()[0]
    bn, bw, bi = _brute_moran(xs, ys, counts)
    assert row["n_cells"] == bn and row["w_pairs"] == bw
    assert abs(row["moran_i"] - bi) < 1e-12


def test_moran_stripes_negative(ray_session):
    """Alternating dense/sparse COLUMN stripes -> strong negative
    autocorrelation under queen adjacency (6 of a cell's 8 neighbors
    lie in the opposite stripe; a checkerboard would be diluted to
    -0.09 because its 4 diagonal neighbors share its parity)."""
    import ray.data as rd

    xs, ys, counts = [], [], []
    for a in range(4, 10):
        for b in range(4, 10):
            xs.append(a)
            ys.append(b)
            counts.append(9 if a % 2 == 0 else 1)
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    row = moran_i(ds, level=6).take_all()[0]
    assert abs(row["moran_i"] - (-0.45454545454545453)) < 1e-12


def test_gi_star_vs_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(43)
    xs = rng.integers(3, 30, 40)
    ys = rng.integers(3, 30, 40)
    key = xs * 1000 + ys
    _, idx = np.unique(key, return_index=True)
    xs, ys = xs[idx], ys[idx]
    counts = rng.integers(1, 7, len(xs))
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    out = {(r["cell_x"], r["cell_y"]): (r["n_images"], r["gi_star"])
           for r in getis_gi_cells(ds, level=6).take_all()}

    pts = {(int(a), int(b)): int(c) for a, b, c in zip(xs, ys, counts)}
    x = np.array(list(pts.values()), dtype=np.float64)
    n, m, s = len(x), x.mean(), x.std()
    for (a, b), c in pts.items():
        wsum = sum(pts.get((a + da, b + db), 0)
                   for da in (-1, 0, 1) for db in (-1, 0, 1))
        wdeg = sum((a + da, b + db) in pts
                   for da in (-1, 0, 1) for db in (-1, 0, 1))
        gi = (wsum - m * wdeg) / (
            s * np.sqrt((n * wdeg - wdeg * wdeg) / (n - 1.0)))
        got_n, got_gi = out[(a, b)]
        assert got_n == c
        assert abs(got_gi - gi) < 1e-9
    assert len(out) == len(pts)


def test_gi_star_peak_is_hottest(ray_session):
    """A single dense 3x3 blob: the center cell carries the max Gi*."""
    import ray.data as rd

    xs, ys, counts = [], [], []
    for a in range(20, 23):
        for b in range(20, 23):
            xs.append(a)
            ys.append(b)
            counts.append(50)
    for i in range(30):
        xs.append(40 + (i % 6))
        ys.append(5 + (i // 6) * 3)
        counts.append(1)
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    rows = getis_gi_cells(ds, level=6).take_all()
    best = max(rows, key=lambda r: r["gi_star"])
    assert (best["cell_x"], best["cell_y"]) == (21, 21)


def _brute_skyline(x, y):
    keep = []
    for i in range(len(x)):
        dominated = any(
            x[j] >= x[i] and y[j] >= y[i]
            and (x[j] > x[i] or y[j] > y[i]) for j in range(len(x)))
        if not dominated:
            keep.append(i)
    return set(keep)


def test_skyline_kernel_vs_brute():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        x = rng.integers(0, 12, n).astype(np.int64)
        y = rng.integers(0, 12, n).astype(np.int64)
        got = set(_skyline_keep(x, y).tolist())
        assert got == _brute_skyline(x, y), (trial, x, y)


def test_skyline_dataset_ties_and_blocks(ray_session):
    import ray.data as rd

    # two identical maxima must BOTH survive; dominated rows must not
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "x": pa.array([5.0, 5.0, 4.0, 5.0, 1.0]),
        "y": pa.array([9, 9, 9, 3, 1], type=pa.int64()),
    })
    out = skyline(rd.from_arrow(t).repartition(4), "x", "y",
                  carry_cols=["id"]).take_all()
    assert sorted(r["id"] for r in out) == [1, 2]


def test_skyline_empty(ray_session):
    import ray.data as rd

    t = pa.table({"id": pa.array([], type=pa.int64()),
                  "x": pa.array([], type=pa.float64()),
                  "y": pa.array([], type=pa.int64())})
    out = skyline(rd.from_arrow(t), "x", "y", carry_cols=["id"])
    assert out.count() == 0


def test_local_moran_vs_brute(ray_session):
    """LISA per cell vs the textbook per-cell formula."""
    import ray.data as rd

    from osmium_tool_ray.stages.raster import local_moran_cells

    rng = np.random.default_rng(47)
    xs = rng.integers(3, 30, 50)
    ys = rng.integers(3, 30, 50)
    key = xs * 1000 + ys
    _, idx = np.unique(key, return_index=True)
    xs, ys = xs[idx], ys[idx]
    counts = rng.integers(1, 8, len(xs))
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    out = {(r["cell_x"], r["cell_y"]): r["local_i"]
           for r in local_moran_cells(ds, level=6).take_all()}

    pts = {(int(a), int(b)): int(c) for a, b, c in zip(xs, ys, counts)}
    x = np.array(list(pts.values()), dtype=np.float64)
    m = x.mean()
    s2m = ((x - m) ** 2).mean()
    for (a, b), c in pts.items():
        nsum = sum((pts.get((a + da, b + db), 0) - m)
                   for da in (-1, 0, 1) for db in (-1, 0, 1)
                   if not (da == 0 and db == 0)
                   and (a + da, b + db) in pts)
        li = (c - m) * nsum / s2m
        assert abs(out[(a, b)] - li) < 1e-9, ((a, b), out[(a, b)], li)
    assert len(out) == len(pts)


def test_local_moran_sums_to_global(ray_session):
    """Anselin's identity: sum_i I_i == N * global Moran numerator /
    denominator scaling — concretely sum(local_i) / W == global I."""
    import ray.data as rd

    from osmium_tool_ray.stages.raster import local_moran_cells

    rng = np.random.default_rng(53)
    xs = rng.integers(3, 25, 45)
    ys = rng.integers(3, 25, 45)
    key = xs * 1000 + ys
    _, idx = np.unique(key, return_index=True)
    xs, ys = xs[idx], ys[idx]
    counts = rng.integers(1, 9, len(xs))
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    local = sum(r["local_i"]
                for r in local_moran_cells(ds, level=6).take_all())
    g = moran_i(ds, level=6).take_all()[0]
    assert abs(local / g["w_pairs"] - g["moran_i"]) < 1e-9


def test_join_counts_vs_brute(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.raster import join_count_stats

    rng = np.random.default_rng(59)
    xs = rng.integers(3, 20, 60)
    ys = rng.integers(3, 20, 60)
    key = xs * 1000 + ys
    _, idx = np.unique(key, return_index=True)
    xs, ys = xs[idx], ys[idx]
    counts = rng.integers(1, 6, len(xs))
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    row = join_count_stats(ds, level=6, hot_threshold=3).take_all()[0]

    pts = {(int(a), int(b)): int(c) for a, b, c in zip(xs, ys, counts)}
    hot = {k: v >= 3 for k, v in pts.items()}
    bb = bw = ww = 0
    keys = list(pts)
    for i, (a, b) in enumerate(keys):
        for (a2, b2) in keys[i + 1:]:
            if max(abs(a - a2), abs(b - b2)) == 1 or \
                    (abs(a - a2) <= 1 and abs(b - b2) <= 1
                     and (a, b) != (a2, b2)):
                if hot[(a, b)] and hot[(a2, b2)]:
                    bb += 1
                elif hot[(a, b)] != hot[(a2, b2)]:
                    bw += 1
                else:
                    ww += 1
    assert (row["bb"], row["bw"], row["ww"]) == (bb, bw, ww)
    assert row["w_pairs"] == bb + bw + ww
    assert row["n_hot"] == sum(hot.values())
    assert row["n_cold"] == len(pts) - sum(hot.values())


def test_join_counts_checkerboard_all_bw(ray_session):
    """Rook-adjacent checkerboard of hot/cold: every ROOK pair is BW;
    diagonals are same-class."""
    import ray.data as rd

    from osmium_tool_ray.stages.raster import join_count_stats

    xs, ys, counts = [], [], []
    for a in range(10, 14):
        for b in range(10, 14):
            xs.append(a)
            ys.append(b)
            counts.append(5 if (a + b) % 2 == 0 else 1)
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    row = join_count_stats(ds, level=6, hot_threshold=3).take_all()[0]
    # 4x4 grid: 24 rook pairs (all BW), 18 diagonal pairs (same class)
    assert row["bw"] == 24
    assert row["bb"] + row["ww"] == 18


def test_semivariogram_vs_brute(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.raster import semivariogram_cells

    rng = np.random.default_rng(61)
    xs = rng.integers(3, 18, 50)
    ys = rng.integers(3, 18, 50)
    key = xs * 1000 + ys
    _, idx = np.unique(key, return_index=True)
    xs, ys = xs[idx], ys[idx]
    counts = rng.integers(1, 9, len(xs))
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    got = {r["lag"]: (r["w_pairs"], r["gamma"])
           for r in semivariogram_cells(ds, level=6,
                                        max_lag=3).take_all()}

    pts = {(int(a), int(b)): int(c) for a, b, c in zip(xs, ys, counts)}
    for lg in (1, 2, 3):
        tot = 0
        w = 0
        for (a, b), xi in pts.items():
            for (a2, b2), xj in pts.items():
                if max(abs(a - a2), abs(b - b2)) == lg:
                    tot += (xi - xj) ** 2
                    w += 1
        if w:
            assert got[lg][0] == w
            assert abs(got[lg][1] - tot / (2 * w)) < 1e-12
        else:
            assert lg not in got


def test_semivariogram_smooth_gradient_rises(ray_session):
    """A linear ramp surface: gamma grows ~quadratically with lag."""
    import ray.data as rd

    from osmium_tool_ray.stages.raster import semivariogram_cells

    xs, ys, counts = [], [], []
    for a in range(10, 22):
        for b in range(10, 22):
            xs.append(a)
            ys.append(b)
            counts.append(1 + (a - 10))       # ramp in x
    ds = _cells_ds(rd, xs, ys, counts, level=6)
    got = {r["lag"]: r["gamma"]
           for r in semivariogram_cells(ds, level=6,
                                        max_lag=3).take_all()}
    assert got[1] < got[2] < got[3]
