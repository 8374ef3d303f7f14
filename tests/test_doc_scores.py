"""Intra-doc repetition ratio and unigram corpus-frequency score
(stages/text.repetition_score / doc_lm_score) vs DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.text import doc_lm_score, repetition_score


def _docs_tbl(seed=6, n=90):
    rng = np.random.default_rng(seed)
    vocab = np.array(["x", "y", "z", "w", "loop"])
    texts = [" ".join(vocab[rng.integers(0, 5, rng.integers(1, 20))])
             for _ in range(n)]
    texts[3] = "spam spam spam spam spam spam"       # fully repetitive
    texts[5] = "a"                                    # shorter than n
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "text": pa.array(texts)})


def test_repetition_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _docs_tbl()
    out = repetition_score(rd.from_arrow(tbl).repartition(4), n=3)
    mine = {r["doc_id"]: (r["n_windows"], r["n_distinct"], r["rep_ratio"])
            for r in out.take_all()}
    oracle = duckdb.sql(r"""
        WITH arrs AS (SELECT doc_id,
                             string_split_regex(lower(text), '\s+') AS arr
                      FROM tbl),
        dg AS (SELECT doc_id, array_to_string(arr[i:i+2], ' ') AS g
               FROM (SELECT doc_id, arr,
                            unnest(generate_series(1, len(arr) - 2)) AS i
                     FROM arrs)),
        agg AS (SELECT doc_id, count(*) AS total, count(DISTINCT g) AS nd
                FROM dg GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.total, 0), COALESCE(a.nd, 0),
               CASE WHEN COALESCE(a.total, 0) > 0
                    THEN 1.0 - CAST(a.nd AS DOUBLE) / CAST(a.total AS DOUBLE)
                    ELSE 0.0 END
        FROM tbl d LEFT JOIN agg a USING (doc_id)""").fetchall()
    assert mine == {d: (t, nd, r) for d, t, nd, r in oracle}
    # the planted doc: 4 trigram windows, 1 distinct ('spam spam spam')
    assert mine[3] == (4, 1, 0.75)
    # too-short doc: no windows, ratio 0
    assert mine[5] == (0, 0, 0.0)


def test_doc_lm_score_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _docs_tbl(seed=9)
    out = doc_lm_score(rd.from_arrow(tbl).repartition(5))
    mine = {r["doc_id"]: (r["freq_sum"], r["n_words"], r["mean_word_freq"])
            for r in out.take_all()}
    oracle = duckdb.sql(r"""
        WITH words AS (SELECT doc_id, t.w AS word
                       FROM tbl,
                            unnest(string_split_regex(lower(text),
                                                      '\s+')) AS t(w)
                       WHERE t.w <> ''),
        cnt AS (SELECT word, count(*) AS n FROM words GROUP BY word),
        per AS (SELECT w.doc_id, SUM(n) AS s, COUNT(*) AS c
                FROM words w JOIN cnt USING (word) GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(p.s, 0), COALESCE(p.c, 0),
               CASE WHEN COALESCE(p.c, 0) > 0
                    THEN CAST(p.s AS DOUBLE) / CAST(p.c AS DOUBLE)
                    ELSE 0.0 END
        FROM tbl d LEFT JOIN per p USING (doc_id)""").fetchall()
    assert mine == {d: (s, c, m) for d, s, c, m in oracle}


def test_doc_lm_score_bucketed_join_path_parity(ray_session):
    """broadcast_cap=1 forces the bucketed-join scale path (no driver
    vocab fold); per-doc sums and means must match the broadcast path,
    including docs whose text has no tokens (sentinel rows)."""
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.stages.text import doc_lm_score

    tbl = _docs_tbl(seed=9)
    # append a token-less doc to pin the LEFT-JOIN semantics
    tbl = pa.concat_tables([tbl, pa.table({
        "doc_id": pa.array([10_000], type=tbl.schema.field("doc_id").type),
        "text": pa.array([""])}).select(tbl.schema.names)]) \
        if set(tbl.schema.names) == {"doc_id", "text"} else tbl
    ds = rd.from_arrow(tbl).repartition(5)
    key = lambda rows: sorted(
        (r["doc_id"], r["freq_sum"], r["n_words"], r["mean_word_freq"])
        for r in rows)
    want = key(doc_lm_score(ds).take_all())
    got = key(doc_lm_score(ds, broadcast_cap=1).take_all())
    assert got == want and len(got) > 0


def test_chunk_docs_overlap_and_edges(ray_session):
    """Chunking semantics: stride windows with overlap, tail chunks
    shorter, exact-multiple lengths don't emit an empty tail, empty docs
    keep one empty chunk."""
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.stages.text import chunk_docs

    texts = ["abcdefghij",        # 10 chars
             "abcd",              # shorter than size
             "",                  # empty -> one empty chunk
             "abcdef"]            # exactly 2 strides at size=3,stride=3
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "text": pa.array(texts)})
    out = chunk_docs(rd.from_arrow(tbl).repartition(2), size=4,
                     stride=3).take_all()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
        assert r["n_chars"] == len(r["chunk"])
    assert sorted(got[0]) == [(0, "abcd"), (1, "defg"), (2, "ghij")]
    assert sorted(got[1]) == [(0, "abcd")]
    assert sorted(got[2]) == [(0, "")]
    assert sorted(got[3]) == [(0, "abcd"), (1, "def")]
    # non-overlapping: stride == size
    out2 = chunk_docs(rd.from_arrow(tbl), size=3, stride=3).take_all()
    c0 = sorted((r["chunk_id"], r["chunk"]) for r in out2
                if r["doc_id"] == 3)
    assert c0 == [(0, "abc"), (1, "def")]  # no empty third chunk


def test_chunk_docs_unicode_codepoints(ray_session):
    """Non-ASCII batches chunk by CODEPOINTS (DuckDB substring
    semantics), not bytes — boundaries land between multi-byte chars."""
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.stages.text import chunk_docs

    text = "äöü" * 4                       # 12 chars, 24 bytes
    tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array([text, "plain ascii here"])})
    out = chunk_docs(rd.from_arrow(tbl), size=5, stride=4).take_all()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk"], r["n_chars"]))
    for did, src in ((0, text), (1, "plain ascii here")):
        n = len(src)
        n_chunks = max(0, -(-(n - 5) // 4)) + 1
        expect = [(ci, src[ci * 4:ci * 4 + 5],
                   len(src[ci * 4:ci * 4 + 5])) for ci in range(n_chunks)]
        assert sorted(got[did]) == expect, did
