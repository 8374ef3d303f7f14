"""KMV / theta distinct-set-operations sketch (stages/sketches.py):
exactness below k, merge == single-pass, pairwise union/intersection
estimator accuracy below AND above k, and the distributed per-key fold
vs exact set arithmetic."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.sketches import (
    kmv_distinct, kmv_fold, kmv_merge, kmv_pair_ops, kmv_set_ops_per_key,
)


def _vals(prefix, n, start=0):
    return pa.array([f"{prefix}{i}" for i in range(start, start + n)])


def test_kmv_exact_below_k():
    sk = kmv_fold(_vals("u", 500), k=1024)
    assert len(sk) == 500
    assert kmv_distinct(sk, 1024) == 500.0


def test_kmv_estimate_above_k():
    n = 50_000
    sk = kmv_fold(_vals("u", n), k=1024)
    assert len(sk) == 1024
    est = kmv_distinct(sk, 1024)
    # standard error ~ 1/sqrt(k-1) ~ 3.1%; allow 4 sigma
    assert abs(est - n) / n < 0.13, est


def test_kmv_merge_equals_single_pass():
    vals = [f"v{i % 7000}" for i in range(20_000)]
    whole = kmv_fold(pa.array(vals), k=512)
    parts = [kmv_fold(pa.array(vals[lo:lo + 1_717]), k=512)
             for lo in range(0, len(vals), 1_717)]
    assert np.array_equal(whole, kmv_merge(parts, k=512))


def test_kmv_pair_ops_exact_when_below_k():
    # A = u0..u599, B = u300..u899 -> union 900, intersection 300
    a = kmv_fold(_vals("u", 600), k=4096)
    b = kmv_fold(_vals("u", 600, start=300), k=4096)
    u, i = kmv_pair_ops(a, b, k=4096)
    assert (u, i) == (900.0, 300.0)


def test_kmv_pair_ops_estimates_above_k():
    # A = 0..29999, B = 15000..44999 -> union 45000, intersection 15000
    a = kmv_fold(_vals("u", 30_000), k=2048)
    b = kmv_fold(_vals("u", 30_000, start=15_000), k=2048)
    u, i = kmv_pair_ops(a, b, k=2048)
    assert abs(u - 45_000) / 45_000 < 0.10, u
    assert abs(i - 15_000) / 15_000 < 0.15, i


def test_kmv_set_ops_per_key_dataset(ray_session):
    """Distributed per-key fold vs exact python set arithmetic on an
    overlapping 3-segment corpus, fragmented across blocks."""
    import ray.data as rd

    rows_k, rows_v = [], []
    segs = {"a": range(0, 700), "b": range(400, 1_100),
            "c": range(900, 1_000)}
    for kname, rng in segs.items():
        for i in rng:
            for _ in range(2):  # duplicates must not matter
                rows_k.append(kname)
                rows_v.append(f"u{i}")
    ds = rd.from_arrow(pa.table({"seg": rows_k, "val": rows_v})) \
        .random_shuffle(seed=7).repartition(9)
    out = kmv_set_ops_per_key(ds, "seg", "val", k=4096).to_pandas() \
        .set_index(["key_a", "key_b"])
    sets = {k: {f"u{i}" for i in rng} for k, rng in segs.items()}
    for ka, kb in [("a", "b"), ("a", "c"), ("b", "c")]:
        row = out.loc[(ka, kb)]
        assert row["union_distinct"] == len(sets[ka] | sets[kb])
        assert row["inter_distinct"] == len(sets[ka] & sets[kb])
