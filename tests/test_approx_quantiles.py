"""Mergeable approximate-quantile sketch (stages/sketches
.approx_quantiles): rank-error bound vs numpy exact, partitioning
robustness, empty input."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.sketches import approx_quantiles

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_err(values, q, est):
    r = np.searchsorted(np.sort(values), est, side="right") / len(values)
    return abs(r - q)


def test_rank_error_bound(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    vals = rng.lognormal(0, 2, 60_000)     # heavy-tailed on purpose
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(24)
    out = approx_quantiles(ds, "x", QS, k_per_block=256)
    for q, est in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        assert _rank_err(vals, q, est) < 0.01, (q, est)


def test_partitioning_changes_only_within_bound(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    vals = rng.normal(0, 1, 30_000)
    tbl = pa.table({"x": pa.array(vals)})
    for parts in (3, 17):
        ds = rd.from_arrow(tbl).repartition(parts)
        out = approx_quantiles(ds, "x", [0.5], k_per_block=512)
        assert _rank_err(vals, 0.5, out["value"][0].as_py()) < 0.005


def test_empty_input(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": pa.array([], type=pa.float64())}))
    out = approx_quantiles(ds, "x", QS)
    assert out.num_rows == 0


def test_grouped_approx_quantiles_bound(ray_session):
    """Per-key sketch within 2% rank error of each key's exact
    quantiles (k_per_block=128, a few blocks per key)."""
    import ray.data as rd

    from osmium_tool_ray.stages.sketches import approx_quantiles_per_key

    rng = np.random.default_rng(29)
    n = 40_000
    keys = rng.integers(1, 6, n)
    vals = rng.normal(keys * 10.0, 3.0)         # per-key distinct dists
    tbl = pa.table({"k": pa.array(keys, type=pa.int64()),
                    "x": pa.array(vals)})
    out = approx_quantiles_per_key(
        rd.from_arrow(tbl).repartition(12), "k", "x", [0.1, 0.5, 0.9])
    got = {}
    for r in out.take_all():
        got[(r["k"], r["q"])] = r["value"]
    for k in range(1, 6):
        kv = np.sort(vals[keys == k])
        for q in (0.1, 0.5, 0.9):
            est = got[(k, q)]
            rank = np.searchsorted(kv, est, side="right") / len(kv)
            assert abs(rank - q) < 0.02, (k, q, est)


def test_approx_quantiles_two_level_compaction(ray_session):
    """Enough partial rows to cross the bucketed-compaction threshold
    (64*k): the intermediate re-stride keeps the driver fold bounded and
    the result within the 2N/k two-level rank bound."""
    import numpy as np
    import ray.data as rd

    from osmium_tool_ray.stages.sketches import approx_quantiles

    rng = np.random.default_rng(7)
    n, k = 50_000, 64
    vals = rng.normal(size=n)
    ds = rd.from_items([{"v": float(x)} for x in vals]).repartition(150)
    out = approx_quantiles(ds, "v", [0.1, 0.5, 0.9], k_per_block=k)
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    s = np.sort(vals)
    for q, gv in got.items():
        rank = np.searchsorted(s, gv)
        assert abs(rank - q * n) <= 2.5 * n / k + 150, (q, rank)
