"""Ripley's K pair counts (stages/spatial.ripley_pair_counts) vs a
brute-force all-pairs count, including a zero-count radius."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.spatial import ripley_pair_counts


def test_ripley_vs_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    n = 600
    x = rng.integers(-5000, 5000, n).astype(np.int64)
    y = rng.integers(-5000, 5000, n).astype(np.int64)
    pts = pa.table({"id": pa.array(range(n), type=pa.int64()),
                    "x": pa.array(x), "y": pa.array(y)})
    radii = [1, 150, 600, 2500]        # radius 1: expect 0 pairs
    out = ripley_pair_counts(rd.from_arrow(pts).repartition(5),
                             "id", "x", "y", radii)
    mine = {r["r"]: r["n_pairs"] for r in out.take_all()}

    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    iu = np.triu_indices(n, k=1)
    want = {r: int((d2[iu] <= r * r).sum()) for r in radii}
    assert mine == want
    assert mine[1] == 0 and mine[2500] > 0


def test_ripley_all_radii_present_when_empty(ray_session):
    import ray.data as rd

    pts = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                    "x": pa.array([0, 100000], type=pa.int64()),
                    "y": pa.array([0, 100000], type=pa.int64())})
    out = ripley_pair_counts(rd.from_arrow(pts), "id", "x", "y",
                             [10, 20])
    assert {r["r"]: r["n_pairs"] for r in out.take_all()} \
        == {10: 0, 20: 0}
