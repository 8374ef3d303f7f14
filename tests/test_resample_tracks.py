"""resample_tracks (stages/spatial.py): grid interpolation vs a pure-
Python per-pair reference; duplicate-timestamp and boundary semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.spatial import resample_tracks


def _ref(rows, dt):
    """rows: (key, t, tie, x). Expected {(key, tg): x_interp}."""
    out = {}
    by_key = {}
    for k, t, tie, x in rows:
        by_key.setdefault(k, []).append((t, tie, x))
    for k, pts in by_key.items():
        pts.sort()
        for (t0, _, x0), (t1, _, x1) in zip(pts, pts[1:]):
            g = ((t0 + dt - 1) // dt) * dt
            while g < t1:
                out[(k, g)] = x0 + (x1 - x0) * ((g - t0) / (t1 - t0))
                g += dt
    return out


def _run(rows, dt):
    tbl = pa.table({
        "k": pa.array([r[0] for r in rows], type=pa.int64()),
        "t": pa.array([r[1] for r in rows], type=pa.int64()),
        "tie": pa.array([r[2] for r in rows], type=pa.int64()),
        "x": pa.array([r[3] for r in rows], type=pa.int64())})
    df = resample_tracks(rd.from_arrow(tbl).repartition(5),
                         "k", "t", "tie", ["x"], dt=dt).to_pandas()
    return {(int(r.k), int(r.ts_grid)): float(r.x)
            for r in df.itertuples()}


def test_resample_matches_reference(ray_session):
    rng = np.random.default_rng(9)
    rows = []
    for k in range(6):
        ts = np.unique(rng.integers(0, 5_000, 40))
        for i, t in enumerate(ts):
            rows.append((k, int(t), i, int(rng.integers(-500, 500))))
    got = _run(rows, dt=97)
    want = _ref(rows, dt=97)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], key


def test_resample_boundaries(ray_session):
    # point exactly on the grid emits at t0; duplicate ts emits nothing;
    # pair spanning no grid instant emits nothing
    rows = [(1, 100, 0, 10), (1, 100, 1, 99), (1, 130, 2, 40),
            (1, 290, 3, 200)]
    got = _run(rows, dt=100)
    # pairs: (100,100) spans nothing; (100,130) contains grid 100 and
    # interpolates from the SECOND duplicate row (tie order) at frac 0;
    # (130,290) contains grid 200 only
    exp_200 = 40 + (200 - 40) * ((200 - 130) / (290 - 130))
    assert got == {(1, 100): 99.0, (1, 200): exp_200}
