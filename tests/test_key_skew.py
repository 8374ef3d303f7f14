"""key_skew_profile (pipelines/stats.py): Gini/top-share vs a direct
sorted-rank reference, uniform and pathological-skew distributions."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.stats import key_skew_profile


def _ref(keys):
    _, cnt = np.unique(keys, return_counts=True)
    c = np.sort(cnt).astype(np.int64)
    n, total = len(c), int(c.sum())
    s = int((np.arange(1, n + 1) * c).sum())
    gini = (2.0 * s) / (n * total) - (n + 1.0) / n
    return n, total, int(c[-1]), int(c[-1]) / total, gini


def _run(keys):
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(6)
    df = key_skew_profile(ds, "k").to_pandas()
    r = df.iloc[0]
    return (int(r.n_keys), int(r.n_rows), int(r.max_cnt),
            float(r.top_share), float(r.gini))


def test_skew_random(ray_session):
    rng = np.random.default_rng(2)
    keys = rng.zipf(1.6, 3000) % 500          # heavy tail
    assert _run(keys.astype(np.int64)) == _ref(keys)


def test_skew_uniform_gini_zero(ray_session):
    keys = np.repeat(np.arange(40, dtype=np.int64), 5)
    got = _run(keys)
    assert got[:3] == (40, 200, 5)
    assert got[4] == 0.0                      # perfectly balanced


def test_skew_one_hot_key(ray_session):
    keys = np.concatenate([np.zeros(999, np.int64),
                           np.arange(1, 10, dtype=np.int64)])
    got = _run(keys)
    assert got == _ref(keys)
    assert got[3] > 0.98                      # hot key dominates
