"""Misra-Gries heavy hitters (stages/sketches.heavy_hitters): exact
parity with a full groupby at the guaranteed threshold, the all-ties
corner that defeats naive truncation, and candidate-set boundedness."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.sketches import heavy_hitters, mg_survivors


def test_mg_survivors_guarantee():
    """Any value with count > n/(k+1) survives the block summary."""
    rng = np.random.default_rng(3)
    # zipf-ish: value i appears ~ 2000/i times
    vals = np.concatenate([np.full(max(2000 // (i + 1), 1), f"v{i}")
                           for i in range(400)])
    rng.shuffle(vals)
    k = 20
    surv, _ = mg_survivors(pa.array(vals), k)
    surv = set(surv.to_pylist())
    n = len(vals)
    uniq, counts = np.unique(vals, return_counts=True)
    for v, c in zip(uniq, counts):
        if c > n / (k + 1):
            assert v in surv, (v, c, n / (k + 1))


def test_mg_survivors_small_passthrough():
    vals = pa.array(["a", "b", "a"])
    surv, counts = mg_survivors(vals, 10)
    assert sorted(surv.to_pylist()) == ["a", "b"]
    assert sorted(counts.tolist()) == [1, 2]


def _exact_hh(vals, min_frac):
    uniq, counts = np.unique(vals, return_counts=True)
    mc = int(np.ceil(min_frac * len(vals)))
    m = counts >= mc
    return {v: int(c) for v, c in zip(uniq[m], counts[m])}


def test_heavy_hitters_exact_parity(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vals = np.concatenate([
        np.full(5_000, "alpha"), np.full(3_000, "beta"),
        np.full(900, "gamma"),
        np.array([f"tail{i}" for i in range(12_000)]),
    ])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)})).repartition(9)
    got = {r["value"]: r["cnt"]
           for r in heavy_hitters(ds, "value", min_frac=0.03).take_all()}
    assert got == _exact_hh(vals, 0.03)
    assert "alpha" in got and "gamma" in got and "tail5" not in got


def test_heavy_hitters_all_ties_corner(ray_session):
    """>k distinct values all with equal counts: MG survivor sets can be
    empty per block, but the block row count must still reach the total
    so the threshold stays correct (and nothing qualifies)."""
    import ray.data as rd

    vals = np.repeat([f"u{i:04d}" for i in range(3_000)], 2)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)})).repartition(4)
    out = heavy_hitters(ds, "value", min_frac=0.01, k=50).take_all()
    assert out == []


def test_heavy_hitters_uniform_plus_one(ray_session):
    """One genuinely heavy value over a uniform tail is found exactly."""
    import ray.data as rd

    vals = np.concatenate([np.full(800, "hot"),
                           np.array([f"u{i}" for i in range(8_000)])])
    np.random.default_rng(1).shuffle(vals)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)})).repartition(6)
    got = {r["value"]: r["cnt"]
           for r in heavy_hitters(ds, "value", min_frac=0.05).take_all()}
    assert got == {"hot": 800}


def test_heavy_hitters_per_key_vs_exact(ray_session):
    """Grouped MG: per-key thresholds are independent (a value heavy in
    one key but rare in another appears only for the heavy key); parity
    vs a full pandas groupby count."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.stages.sketches import heavy_hitters_per_key

    rng = np.random.default_rng(11)
    keys, vals = [], []
    for lang, vocab, n in [("en", ["the", "cat", "dog", "rare"], 4000),
                           ("de", ["der", "the", "und"], 1500)]:
        p = np.array([0.5, 0.3, 0.15, 0.05])[:len(vocab)]
        p = p / p.sum()
        draws = rng.choice(vocab, n, p=p)
        keys += [lang] * n
        vals += list(draws)
    tbl = pa.table({"lang": pa.array(keys), "word": pa.array(vals)})
    out = heavy_hitters_per_key(
        rd.from_arrow(tbl).repartition(7), "lang", "word",
        min_frac=0.2).take_all()
    got = {(r["lang"], r["word"]): r["cnt"] for r in out}
    import collections
    exact = collections.Counter(zip(keys, vals))
    tot = collections.Counter(keys)
    want = {kv: c for kv, c in exact.items()
            if c >= np.ceil(0.2 * tot[kv[0]])}
    assert got == want and len(got) > 0
