"""Inverted-index postings build (queries: postings_docs) vs DuckDB on
the sf0.001 documents table."""

import duckdb
import pyarrow as pa


def test_postings_vs_duckdb(ray_session):
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["postings_docs"](sf)
    mine = {(r["word"], r["doc_id"]): r["tf"] for r in out.take_all()}
    oracle = duckdb.sql(rf"""
        SELECT t.w, doc_id, COUNT(*)
        FROM read_parquet('{sf}/documents.parquet'),
             unnest(string_split_regex(lower(text), '\s+')) AS t(w)
        WHERE t.w <> '' GROUP BY t.w, doc_id""").fetchall()
    assert mine == {(w, d): c for w, d, c in oracle}
    # tf really aggregates repeats within a doc
    assert max(mine.values()) > 1


def test_word_cooccurrence_vs_duckdb(ray_session):
    """Co-occurrence counts (queries: word_cooccurrence) vs the DuckDB
    self-join on sf0.001."""
    import duckdb

    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    mine = {(r["w1"], r["w2"]): r["n"] for r in
            E.queries()["word_cooccurrence"](sf).take_all()}
    oracle = duckdb.sql(rf"""
        WITH dw AS (
            SELECT DISTINCT doc_id, t.w AS word
            FROM read_parquet('{sf}/documents.parquet'),
                 unnest(string_split_regex(lower(text), '\s+')) AS t(w)
            WHERE t.w <> '')
        SELECT a.word, b.word, COUNT(*) FROM dw a JOIN dw b
          ON a.doc_id = b.doc_id AND a.word < b.word
        GROUP BY a.word, b.word HAVING COUNT(*) >= 40""").fetchall()
    assert mine == {(a, b): n for a, b, n in oracle}
    assert mine and all(a < b for a, b in mine)


def test_bigram_lm_counts_vs_duckdb(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.text import bigram_lm_counts

    tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array([
                        "the cat sat on the mat the cat ran",
                        "the cat sat  on a mat",
                        ""])})
    out = bigram_lm_counts(rd.from_arrow(tbl).repartition(3),
                           min_count=2).take_all()
    mine = {(r["w1"], r["w2"]): (r["n12"], r["n1"], r["p"]) for r in out}
    want = {tuple(r[:2]): tuple(r[2:]) for r in duckdb.sql(r"""
        WITH arrs AS (SELECT string_split_regex(lower(text), '\s+') AS arr
                      FROM tbl),
        bg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2
               FROM (SELECT arr,
                            unnest(generate_series(1, len(arr) - 1)) AS i
                     FROM arrs)
               WHERE arr[i] <> '' AND arr[i + 1] <> ''),
        c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1
               FROM c12 GROUP BY w1)
        SELECT w1, w2, CAST(n12 AS BIGINT), n1,
               CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE)
        FROM c12 JOIN c1 USING (w1) WHERE n12 >= 2""").fetchall()}
    assert mine == want
    # "the cat" appears 3x across docs; marginal counts every "the ..."
    assert mine[("the", "cat")][0] == 3
