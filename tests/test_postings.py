"""Inverted-index postings build (queries: postings_docs) vs DuckDB on
the sf0.001 documents table."""

import duckdb


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
