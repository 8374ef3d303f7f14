"""Cross-doc duplicate n-gram spans (stages/text.dup_spans) vs a DuckDB
oracle — the Lee-et-al-2022 substring-dedup diagnostics table."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.text import dup_spans


def _docs_tbl(seed=9, n=80):
    rng = np.random.default_rng(seed)
    vocab = np.array(["red", "blue", "fox", "jump", "over", "lazy", "dog"])
    texts = [" ".join(vocab[rng.integers(0, 7, rng.integers(2, 25))])
             for _ in range(n)]
    # planted shared span across three docs (and twice inside doc 4)
    span = "the quick brown fox jumps over"
    texts[2] = texts[2] + " " + span
    texts[4] = span + " " + texts[4] + " " + span
    texts[7] = span
    texts[9] = "solo"                                 # shorter than n
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "text": pa.array(texts)})


def _oracle(tbl, n, min_docs):
    return duckdb.sql(rf"""
        WITH arrs AS (SELECT doc_id,
                             string_split_regex(lower(text), '\s+') AS arr
                      FROM tbl),
        dg AS (SELECT doc_id, array_to_string(arr[i:i+{n - 1}], ' ') AS g
               FROM (SELECT doc_id, arr,
                            unnest(generate_series(1, len(arr) - {n - 1})) AS i
                     FROM arrs)),
        per_doc AS (SELECT g, doc_id, count(*) AS c FROM dg GROUP BY 1, 2)
        SELECT g AS gram, count(*) AS n_docs,
               CAST(SUM(c) AS BIGINT) AS n_occurrences
        FROM per_doc GROUP BY g HAVING count(*) >= {min_docs}
        ORDER BY gram""").fetchall()


def test_dup_spans_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _docs_tbl()
    for n, min_docs in ((3, 2), (6, 2), (6, 3)):
        out = dup_spans(rd.from_arrow(tbl).repartition(4),
                        n=n, min_docs=min_docs)
        mine = sorted((r["gram"], r["n_docs"], r["n_occurrences"])
                      for r in out.take_all())
        assert mine == [tuple(r) for r in _oracle(tbl, n, min_docs)]


def test_dup_spans_planted_span_found(ray_session):
    import ray.data as rd

    tbl = _docs_tbl()
    out = dup_spans(rd.from_arrow(tbl).repartition(3), n=6, min_docs=3)
    rows = {r["gram"]: (r["n_docs"], r["n_occurrences"])
            for r in out.take_all()}
    assert rows["the quick brown fox jumps over"] == (3, 4)
