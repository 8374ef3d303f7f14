"""Perceptual-hash hamming LSH near-dup (stages/dedup.phash_neardup):
known-pair fixture, hot-bucket cap semantics, and DuckDB banded-join
parity on a randomized table."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.dedup import phash_neardup


def _tbl(ids, hashes):
    return pa.table({
        "image_id": pa.array(ids),
        "phash": pa.array(np.asarray(hashes, dtype=np.uint64)
                          .view(np.int64)),
    })


def test_known_pairs(ray_session):
    import ray.data as rd

    base = 0x123456789ABCDEF0
    tbl = _tbl(
        ["a", "b", "c", "d"],
        [base,
         base ^ 0b111,                # hamming 3, shares 3 bands with a
         base ^ ((1 << 63) | (1 << 1)),  # hamming 2 vs a, bands 1-2 shared
         0x0F0F0F0F0F0F0F0F])         # far from everything
    out = phash_neardup(rd.from_arrow(tbl), t=4, cap=10)
    pairs = sorted((r["id_a"], r["id_b"]) for r in out.take_all())
    assert ("a", "b") in pairs and ("a", "c") in pairs
    assert not any("d" in p for p in pairs)


def test_hot_bucket_cap_skips(ray_session):
    """A band bucket larger than cap emits nothing — identical hashes in
    an oversized bucket produce no pairs through that band."""
    import ray.data as rd

    n = 40
    tbl = _tbl([f"i{j:03d}" for j in range(n)],
               [0x1111000000000000 | j for j in range(n)])
    # all rows share bands 0,1,2 (buckets of 40); with cap=10 those are
    # skipped and band 3 values are distinct -> no pairs at all
    out = phash_neardup(rd.from_arrow(tbl), t=64, cap=10)
    assert out.count() == 0
    # raising the cap re-enables the shared bands
    out2 = phash_neardup(rd.from_arrow(tbl), t=64, cap=100)
    assert out2.count() == n * (n - 1) // 2


def test_vs_duckdb_banded_join(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(41)
    n = 300
    base = rng.integers(0, 2**63, 40, dtype=np.uint64)
    # clusters of near-identical hashes + noise
    hashes = []
    for i in range(n):
        b = base[i % 40]
        flips = rng.integers(0, 64, rng.integers(0, 4))
        for f in flips:
            b = b ^ (np.uint64(1) << np.uint64(f))
        hashes.append(b)
    tbl = _tbl([f"im{i:04d}" for i in range(n)], hashes)
    out = phash_neardup(rd.from_arrow(tbl).repartition(5), t=10, cap=50)
    mine = sorted((r["id_a"], r["id_b"]) for r in out.take_all())
    oracle = duckdb.sql("""
        WITH bands AS (
            SELECT image_id, phash, band,
                   (phash >> (48 - band * 16)) & 65535 AS v
            FROM tbl, range(4) t(band)),
        ok AS (SELECT band, v FROM bands GROUP BY band, v
               HAVING count(*) BETWEEN 2 AND 50),
        cand AS (SELECT DISTINCT a.image_id AS id_a, b.image_id AS id_b,
                        a.phash AS pa, b.phash AS pb
                 FROM bands a
                 JOIN ok ON ok.band = a.band AND ok.v = a.v
                 JOIN bands b ON a.band = b.band AND a.v = b.v
                      AND a.image_id < b.image_id)
        SELECT id_a, id_b FROM cand
        WHERE bit_count(xor(pa, pb)) <= 10""").fetchall()
    assert mine == sorted(oracle)
    assert len(mine) > 0
