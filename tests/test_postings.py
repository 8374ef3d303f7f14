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
