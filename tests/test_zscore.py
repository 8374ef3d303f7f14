"""zscore_per_key (pipelines/stats.py): exact-moment z-scores vs a
per-key numpy reference, constant-group zeroes, and string keys."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.stats import zscore_per_key


def _ref(keys, vals):
    out = np.zeros(len(vals), dtype=np.float64)
    for k in set(keys):
        m = np.asarray(keys) == k
        v = vals[m].astype(np.int64)
        n, s, s2 = len(v), v.sum(), (v * v).sum()
        var_num = n * s2 - s * s
        if var_num == 0:
            out[m] = 0.0
        else:
            out[m] = (v - s / n) / (np.sqrt(float(var_num)) / n)
    return out


def test_zscore_int_keys(ray_session):
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 9, 500)
    vals = rng.integers(0, 100, 500)
    tbl = pa.table({"rid": np.arange(500, dtype=np.int64),
                    "k": keys, "v": vals})
    out = zscore_per_key(rd.from_arrow(tbl).repartition(6), "k", "v",
                         carry_cols=["rid"]).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    assert np.array_equal(out["z"].to_numpy(), _ref(keys, vals))


def test_zscore_constant_and_singleton_groups(ray_session):
    tbl = pa.table({"rid": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "k": pa.array(["a", "a", "b", "c"]),
                    "v": pa.array([5, 5, 7, 9], type=pa.int64())})
    out = zscore_per_key(rd.from_arrow(tbl), "k", "v",
                         carry_cols=["rid"]).to_pandas() \
        .sort_values("rid")
    assert (out["z"] == 0.0).all()
