"""Bloom membership sketch (stages/sketches.py) + the bloom-pruned
semi/anti join (pipelines/idops.semi_join_bloom): no-false-negative
property, distributed-build == single-fold mergeability, and exact parity
with the broadcast semi_join on both join polarities."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.sketches import (
    bloom_build, bloom_fold, bloom_might_contain,
)

N_BITS = 1 << 14


def test_bloom_no_false_negatives():
    keys = pa.array([f"key-{i}" for i in range(5_000)])
    words = bloom_fold(keys, N_BITS, k=4)
    assert bloom_might_contain(words, keys, N_BITS, k=4).all()


def test_bloom_false_positive_rate_reasonable():
    keys = pa.array([f"key-{i}" for i in range(1_000)])
    probes = pa.array([f"other-{i}" for i in range(20_000)])
    words = bloom_fold(keys, N_BITS, k=4)
    fp = bloom_might_contain(words, probes, N_BITS, k=4).mean()
    # theoretical (1-e^{-kn/m})^k ~ 0.0024 at n=1000,m=16384,k=4
    assert fp < 0.02, fp


def test_bloom_merge_equals_single_fold():
    vals = [f"v{i}" for i in range(8_000)]
    whole = bloom_fold(pa.array(vals), N_BITS, k=3, seed=7)
    merged = np.zeros(N_BITS >> 6, dtype=np.uint64)
    for lo in range(0, len(vals), 913):
        merged |= bloom_fold(pa.array(vals[lo:lo + 913]), N_BITS, k=3, seed=7)
    assert np.array_equal(whole, merged)


def test_bloom_build_distributed(ray_session):
    import ray.data as rd

    vals = [f"d{i}" for i in range(6_000)]
    ds = rd.from_arrow(pa.table({"k": pa.array(vals)})).repartition(7)
    words = bloom_build(ds, "k", n_bits=N_BITS, k=4, seed=3)
    assert np.array_equal(words, bloom_fold(pa.array(vals), N_BITS, k=4, seed=3))
    # empty dataset -> empty bitmap (contains nothing)
    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.string())}))
    w0 = bloom_build(empty, "k", n_bits=N_BITS)
    assert not w0.any()


def _fixture(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    ids = np.array([f"row{i:06d}" for i in range(20_000)], dtype=object)
    payload = pa.table({
        "image_id": pa.array(ids, type=pa.string()),
        "phash": pa.array(rng.integers(-2**40, 2**40, len(ids)), type=pa.int64()),
    })
    wanted = np.sort(rng.choice(ids, 700, replace=False))
    wanted_ds = rd.from_arrow(
        pa.table({"image_id": pa.array(wanted, type=pa.string())}))
    return rd.from_arrow(payload).repartition(6), wanted, wanted_ds


def _sorted_ids(ds):
    return sorted(r["image_id"] for r in ds.take_all())


def test_semi_join_bloom_matches_broadcast(ray_session):
    from osmium_tool_ray.pipelines.idops import semi_join, semi_join_bloom

    big, wanted, wanted_ds = _fixture(ray_session)
    # tiny filter => real false positives => exercises the verify stage
    got = _sorted_ids(semi_join_bloom(big, "image_id", wanted_ds,
                                      n_bits=1 << 10, k=2, buckets=4))
    want = _sorted_ids(semi_join(big, "image_id", wanted))
    assert got == want and len(got) == 700


def test_semi_join_bloom_anti(ray_session):
    from osmium_tool_ray.pipelines.idops import semi_join, semi_join_bloom

    big, wanted, wanted_ds = _fixture(ray_session)
    got = _sorted_ids(semi_join_bloom(big, "image_id", wanted_ds,
                                      n_bits=1 << 10, k=2, buckets=4,
                                      invert=True))
    want = _sorted_ids(semi_join(big, "image_id", wanted, invert=True))
    assert got == want and len(got) == 20_000 - 700


def test_semi_join_bloom_approx_superset(ray_session):
    """exact=False returns bloom candidates: superset of true hits, no
    false negatives."""
    from osmium_tool_ray.pipelines.idops import semi_join_bloom

    big, wanted, wanted_ds = _fixture(ray_session)
    got = set(_sorted_ids(semi_join_bloom(big, "image_id", wanted_ds,
                                          n_bits=1 << 10, k=2, exact=False)))
    assert set(wanted.tolist()) <= got


def test_incremental_new_docs_query(ray_session):
    """Incremental ingest dedup (queries: incremental_new_docs) vs the
    NOT IN oracle on sf0.001."""
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    mine = sorted(r["doc_id"] for r in
                  E.queries()["incremental_new_docs"](sf).take_all())
    oracle = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{sf}/documents.parquet')
        WHERE text NOT IN (
            SELECT text FROM read_parquet('{sf}/documents.parquet')
            WHERE doc_id % 3 = 0)""").fetchall()
    assert mine == sorted(d for (d,) in oracle)
    assert mine and not any(d % 3 == 0 for d in mine)
