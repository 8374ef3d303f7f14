"""TF-IDF top terms (stages/text.tfidf_top_terms): parity vs a direct
DuckDB window formulation (bit-exact scores via the linear-idf variant),
and empty/degenerate inputs."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.text import tfidf_top_terms


def _docs():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "the quick red fox",
            "lazy dog sleeps all day the dog snores",
            "",
        ]),
    })


def test_tfidf_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    tbl = _docs()
    out = tfidf_top_terms(rd.from_arrow(tbl).repartition(3), k=3).take_all()
    got = sorted((r["doc_id"], r["word"], r["score"]) for r in out)

    con = duckdb.connect()
    con.register("documents", tbl.to_pandas())
    want = sorted(map(tuple, con.sql(r"""
        WITH words AS (
            SELECT doc_id, t.w AS word
            FROM documents, unnest(string_split_regex(lower(text), '\s+')) t(w)
            WHERE t.w <> ''),
        tf AS (SELECT doc_id, word, count(*) AS c FROM words GROUP BY 1, 2),
        df AS (SELECT word, count(DISTINCT doc_id) AS d FROM words GROUP BY 1),
        n AS (SELECT count(*) AS nn FROM documents)
        SELECT doc_id, word, score FROM (
            SELECT tf.doc_id, tf.word,
                   tf.c * (CAST(nn AS DOUBLE) / df.d) AS score,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.c * (CAST(nn AS DOUBLE) / df.d) DESC,
                                tf.word) AS rn
            FROM tf JOIN df USING (word), n)
        WHERE rn <= 3""").fetchall()))
    assert got == want and len(got) > 0
    # bit-exact float scores (linear idf: one division + one multiply)
    assert all(isinstance(s, float) for _, _, s in got)


def test_tfidf_rare_word_ranks_first(ray_session):
    import ray.data as rd

    out = tfidf_top_terms(rd.from_arrow(_docs()), k=1).take_all()
    top = {r["doc_id"]: r["word"] for r in out}
    # doc 2's rarest signal is 'red' (df=1); 'the'/'quick'/'fox' are shared
    assert top[2] == "red"


def test_tfidf_empty_docs(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                    "text": pa.array([""])})
    out = tfidf_top_terms(rd.from_arrow(tbl)).take_all()
    assert out == []


def test_tfidf_bucketed_join_path_parity(ray_session):
    """broadcast_cap=1 forces the word-hash bucketed join + doc-hash
    segmented top-k (the open-web-vocabulary path); results must equal
    the broadcast path exactly, including (score DESC, word ASC) ties."""
    import ray.data as rd

    docs = _docs()
    want = sorted((r["doc_id"], r["word"], r["score"])
                  for r in tfidf_top_terms(rd.from_arrow(docs), k=2).take_all())
    got = sorted((r["doc_id"], r["word"], r["score"])
                 for r in tfidf_top_terms(rd.from_arrow(docs), k=2,
                                          broadcast_cap=1).take_all())
    assert got == want and len(got) > 0
