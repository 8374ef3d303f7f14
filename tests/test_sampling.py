"""Deterministic sampling (pipelines/sampling.py): partitioning
invariance, split disjointness/coverage, stratified exactness vs a
pandas window, and rate accuracy."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmium_tool_ray.pipelines.sampling import (
    MOD, det_hash, hash_split, stratified_sample, uniform_sample,
)


@pytest.fixture(scope="module")
def docs(ray_session):
    rng = np.random.default_rng(23)
    n = 20_000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(rng.choice(["en", "de", "fr", "zh"], n,
                                    p=[0.55, 0.2, 0.15, 0.1])),
    })
    return tbl


def _ds(ray_session, tbl, parts):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(parts)


def test_uniform_sample_rate_and_invariance(ray_session, docs):
    a = sorted(r["doc_id"] for r in
               uniform_sample(_ds(ray_session, docs, 4), "doc_id", 0.1).take_all())
    b = sorted(r["doc_id"] for r in
               uniform_sample(_ds(ray_session, docs, 13), "doc_id", 0.1).take_all())
    assert a == b                                   # partitioning-invariant
    assert abs(len(a) / docs.num_rows - 0.1) < 0.02
    # matches the closed-form predicate
    h = det_hash(docs["doc_id"].to_numpy())
    want = sorted(docs["doc_id"].to_numpy()[h < int(0.1 * int(MOD))].tolist())
    assert a == want


def test_hash_split_partitions_exactly(ray_session, docs):
    splits = hash_split(_ds(ray_session, docs, 6), "doc_id", (0.8, 0.1, 0.1))
    ids = [sorted(r["doc_id"] for r in s.take_all()) for s in splits]
    allids = sorted(sum(ids, []))
    assert allids == docs["doc_id"].to_numpy().tolist()      # cover, disjoint
    assert abs(len(ids[0]) / docs.num_rows - 0.8) < 0.02
    # deterministic across partitionings
    again = hash_split(_ds(ray_session, docs, 11), "doc_id", (0.8, 0.1, 0.1))
    assert sorted(r["doc_id"] for r in again[1].take_all()) == ids[1]


def test_stratified_sample_matches_window(ray_session, docs):
    n_per = 25
    out = stratified_sample(_ds(ray_session, docs, 7), ["lang"], "doc_id",
                            n_per).take_all()
    got = sorted((r["lang"], r["doc_id"]) for r in out)

    df = docs.to_pandas()
    df["_h"] = det_hash(df["doc_id"].to_numpy())
    df = df.sort_values(["lang", "_h", "doc_id"], kind="stable")
    want = sorted(df.groupby("lang", sort=False).head(n_per)
                  [["lang", "doc_id"]].itertuples(index=False, name=None))
    assert got == want
    counts = pd.Series([lang for lang, _ in got]).value_counts()
    assert (counts == n_per).all()


def test_stratified_small_stratum_returns_all(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                    "lang": pa.array(["en", "en", "en", "rare", "rare"])})
    out = stratified_sample(rd.from_arrow(tbl).repartition(2), ["lang"],
                            "doc_id", 10).take_all()
    assert len(out) == 5


def test_balanced_langs_query(ray_session):
    """Dataset balancing: every language ends at exactly the min count."""
    import collections

    import __ray_entry__ as E

    out = E.queries()["balanced_langs"]("/root/testdata/sf0.001")
    rows = out.take_all()
    per = collections.Counter(r["lang"] for r in rows)
    assert len(set(per.values())) == 1          # equalized
    import duckdb
    m = duckdb.sql("""SELECT MIN(n) FROM (SELECT lang, COUNT(*) n
        FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        GROUP BY lang)""").fetchone()[0]
    assert set(per.values()) == {m}


def test_quality_filtered_docs_query(ray_session):
    """Learned p90 cut keeps ~90% of docs and respects the threshold."""
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    rows = E.queries()["quality_filtered_docs"](sf).take_all()
    cut = duckdb.sql(f"""SELECT quantile_disc(n_chars, 0.9)
        FROM read_parquet('{sf}/documents.parquet')""").fetchone()[0]
    total = duckdb.sql(f"""SELECT COUNT(*)
        FROM read_parquet('{sf}/documents.parquet')""").fetchone()[0]
    assert all(r["n_chars"] <= cut for r in rows)
    assert 0.85 * total <= len(rows) <= total


def test_fixed_k_sample_exact_and_invariant(ray_session, docs):
    """Exact-k deterministic sample: equals the numpy (hash, id)-order
    head regardless of partitioning; k > n returns everything."""
    from osmium_tool_ray.pipelines.sampling import fixed_k_sample

    ids = docs["doc_id"].to_numpy()
    h = det_hash(ids)
    expect = set(ids[np.lexsort((ids, h))[:137]])
    for parts in (1, 7):
        got = fixed_k_sample(_ds(ray_session, docs, parts),
                             "doc_id", 137).take_all()
        assert {r["doc_id"] for r in got} == expect
        assert set(got[0].keys()) == {"doc_id", "lang"}
    all_rows = fixed_k_sample(_ds(ray_session, docs, 3), "doc_id",
                              10**9).take_all()
    assert len(all_rows) == len(ids)


def test_keyed_rate_sample_rates_and_invariance(ray_session, docs):
    from osmium_tool_ray.pipelines.sampling import keyed_rate_sample

    rates = {"en": 1.0, "de": 0.5, "zh": 0.0}
    ids = docs["doc_id"].to_numpy()
    langs = np.asarray(docs["lang"].to_pylist(), dtype=str)
    h = det_hash(ids)
    t = np.select([langs == "en", langs == "de", langs == "zh"],
                  [int(MOD), int(MOD) // 2, 0], default=int(0.25 * int(MOD)))
    expect = set(ids[h < t])
    for parts in (1, 9):
        got = {r["doc_id"] for r in keyed_rate_sample(
            _ds(ray_session, docs, parts), "doc_id", "lang", rates,
            default_rate=0.25).take_all()}
        assert got == expect
    # en kept fully, zh dropped fully
    assert set(ids[langs == "en"]) <= expect
    assert not expect & set(ids[langs == "zh"])
