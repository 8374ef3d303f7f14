"""Benchmark decontamination (stages/text.contamination_check) vs a
plain-Python n-gram reference and a DuckDB join oracle."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.text import contamination_check


def _ref_counts(texts, bench_texts, n):
    def grams(t):
        w = t.lower().split(" ")
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    bset = {g for t in bench_texts for g in grams(t)}
    return [sum(g in bset for g in grams(t)) for t in texts]


def test_contamination_vs_python(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(14)
    vocab = np.array(list("abcdefghij"))
    texts = [" ".join(vocab[rng.integers(0, 10, 12)]) for _ in range(60)]
    # plant a verbatim benchmark phrase inside two docs
    bench = ["x y z w v u t s", "q r s t u v w x"]
    texts[7] = texts[7] + " " + bench[0]
    texts[31] = bench[1] + " " + texts[31]
    tbl = pa.table({"doc_id": pa.array(range(60), type=pa.int64()),
                    "text": pa.array(texts)})
    btbl = pa.table({"doc_id": pa.array([1000, 1001], type=pa.int64()),
                     "text": pa.array(bench)})
    out = contamination_check(rd.from_arrow(tbl).repartition(6),
                              rd.from_arrow(btbl), n=4)
    mine = {r["doc_id"]: (r["n_contaminated"], r["contaminated"])
            for r in out.take_all()}
    exp = _ref_counts(texts, bench, 4)
    assert mine == {i: (c, c > 0) for i, c in enumerate(exp)}
    assert mine[7][1] and mine[31][1]


def test_contamination_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    vocab = np.array(["aa", "bb", "cc", "dd"])
    texts = [" ".join(vocab[rng.integers(0, 4, rng.integers(2, 15))])
             for _ in range(80)]
    tbl = pa.table({"doc_id": pa.array(range(80), type=pa.int64()),
                    "text": pa.array(texts)})
    bench_tbl = pa.table({"doc_id": pa.array([0, 13], type=pa.int64()),
                          "text": pa.array([texts[0], texts[13]])})
    out = contamination_check(rd.from_arrow(tbl),
                              rd.from_arrow(bench_tbl), n=5)
    mine = {r["doc_id"]: r["n_contaminated"] for r in out.take_all()}
    oracle = duckdb.sql(r"""
        WITH arrs AS (SELECT doc_id,
                             string_split_regex(lower(text), '\s+') AS arr
                      FROM tbl),
        bg AS (SELECT DISTINCT array_to_string(arr[i:i+4], ' ') AS g
               FROM (SELECT arr,
                            unnest(generate_series(1, len(arr) - 4)) AS i
                     FROM arrs WHERE doc_id IN (0, 13))),
        dg AS (SELECT doc_id, array_to_string(arr[i:i+4], ' ') AS g
               FROM (SELECT doc_id, arr,
                            unnest(generate_series(1, len(arr) - 4)) AS i
                     FROM arrs)),
        m AS (SELECT doc_id, count(*) AS nc FROM dg JOIN bg USING (g)
              GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(m.nc, 0) FROM tbl d
        LEFT JOIN m USING (doc_id)""").fetchall()
    assert mine == dict(oracle)


def test_contamination_short_docs_and_empty_bench(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                    "text": pa.array(["one two", "a b c"])})
    empty_bench = pa.table({"doc_id": pa.array([], type=pa.int64()),
                            "text": pa.array([], type=pa.string())})
    out = contamination_check(rd.from_arrow(tbl),
                              rd.from_arrow(empty_bench), n=8)
    rows = {r["doc_id"]: (r["n_contaminated"], r["contaminated"])
            for r in out.take_all()}
    # docs shorter than n produce no windows; empty bench flags nothing
    assert rows == {1: (0, False), 2: (0, False)}
