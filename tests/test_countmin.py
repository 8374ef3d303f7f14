"""Count-min sketch (stages/sketches.countmin_*): exactness at ample
width, one-sided overestimate under forced collisions, distributed
fold == local fold."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.sketches import (countmin_build, countmin_fold,
                                             countmin_query)


def _values(seed=4, n=5000, nkeys=40):
    rng = np.random.default_rng(seed)
    # zipf-ish skew
    weights = 1.0 / np.arange(1, nkeys + 1)
    weights /= weights.sum()
    return np.array([f"k{j}" for j in
                     rng.choice(nkeys, n, p=weights)], dtype=str)


def test_countmin_exact_at_ample_width(ray_session):
    import ray.data as rd

    vals = _values()
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(6)
    cm = countmin_build(ds, "v", d=4, w=2048, merge_buckets=3)
    keys, truth = np.unique(vals, return_counts=True)
    est = countmin_query(cm, keys, d=4, w=2048)
    assert (est == truth).all()
    # distributed fold == local single-pass fold
    assert (cm == countmin_fold(pa.array(vals), d=4, w=2048)).all()


def test_countmin_one_sided_error(ray_session):
    import ray.data as rd

    vals = _values(seed=9, n=8000, nkeys=300)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(4)
    w = 64                                  # force collisions
    cm = countmin_build(ds, "v", d=4, w=w)
    keys, truth = np.unique(vals, return_counts=True)
    est = countmin_query(cm, keys, d=4, w=w)
    assert (est >= truth).all()             # never underestimates
    # classic bound: overshoot <= e/w * N with prob 1 - e^-d per key;
    # assert the MEAN overshoot respects it comfortably
    assert (est - truth).mean() <= np.e / w * len(vals)
