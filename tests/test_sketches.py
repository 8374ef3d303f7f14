"""HyperLogLog distinct-count sketch (stages/sketches.py): accuracy vs
exact distinct counts, merge associativity across partitionings, and
determinism."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.sketches import (
    hll_distinct, hll_estimate, hll_registers,
)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_accuracy(n):
    vals = pa.array([f"item-{i}" for i in range(n)])
    est = hll_estimate(hll_registers(vals, p=14))
    assert abs(est - n) / n < 0.03, (est, n)


def test_hll_merge_equals_single_pass():
    """max-merge of per-chunk registers == registers of the whole stream
    (the mergeability property the distributed fold relies on)."""
    vals = [f"v{i % 7000}" for i in range(20_000)]
    whole = hll_registers(pa.array(vals), p=12)
    merged = np.zeros(1 << 12, dtype=np.uint8)
    for lo in range(0, len(vals), 1_717):
        merged = np.maximum(
            merged, hll_registers(pa.array(vals[lo:lo + 1_717]), p=12))
    assert np.array_equal(whole, merged)


def test_hll_distinct_dataset(ray_session):
    import ray.data as rd

    n_distinct = 3_000
    tbl = pa.table({"k": pa.array([f"d{i % n_distinct}"
                                   for i in range(30_000)])})
    ds = rd.from_arrow(tbl).repartition(8)
    est = hll_distinct(ds, "k", p=14)
    assert abs(est - n_distinct) / n_distinct < 0.03
    # deterministic across runs and partitionings
    est2 = hll_distinct(rd.from_arrow(tbl).repartition(3), "k", p=14)
    assert est == est2


def test_hll_duplicates_do_not_inflate():
    a = hll_registers(pa.array(["x", "y", "z"]), p=10)
    b = hll_registers(pa.array(["x", "y", "z"] * 1000), p=10)
    assert np.array_equal(a, b)


def test_hll_distinct_per_key(ray_session):
    """Grouped HLL estimate within 5% of exact per-key distincts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.stages.sketches import hll_distinct_per_key

    rng = np.random.default_rng(42)
    n = 40_000
    keys = rng.integers(1, 5, n)
    # per-key distinct scales with the key (k=1 few, k=4 many)
    vals = np.asarray([f"v{int(v)}" for v in
                       rng.integers(0, 300, n) * keys])
    tbl = pa.table({"k": pa.array(keys, type=pa.int64()),
                    "v": pa.array(vals)})
    out = hll_distinct_per_key(rd.from_arrow(tbl).repartition(9),
                               "k", "v", p=12)
    est = {r["k"]: r["n_est"] for r in out.take_all()}
    import collections
    exact = collections.defaultdict(set)
    for k, v in zip(keys, vals):
        exact[int(k)].add(v)
    assert set(est) == set(exact)
    for k in exact:
        err = abs(est[k] - len(exact[k])) / len(exact[k])
        assert err < 0.05, (k, est[k], len(exact[k]))
