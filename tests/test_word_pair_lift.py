"""Word-pair association lift (stages/text.word_pair_lift) vs the
DuckDB df/co-count join oracle including bit-exact lift floats."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.text import word_pair_lift

_SQL = """
    WITH dw AS (
        SELECT DISTINCT doc_id, t.w AS word
        FROM tbl, unnest(string_split_regex(lower(text), '\\s+')) AS t(w)
        WHERE t.w <> ''),
    df AS (SELECT word, COUNT(*) AS c FROM dw GROUP BY word),
    nd AS (SELECT COUNT(*) AS n FROM tbl),
    pr AS (SELECT a.word AS wa, b.word AS wb, COUNT(*) AS cab
           FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
           GROUP BY 1, 2 HAVING COUNT(*) >= {mc})
    SELECT wa AS word_a, wb AS word_b, cab AS c_ab,
           da.c AS c_a, db.c AS c_b,
           CAST(nd.n * cab AS DOUBLE) / (da.c * db.c) AS lift
    FROM pr JOIN df da ON da.word = wa JOIN df db ON db.word = wb, nd"""


def _docs(seed=61, n=250, vocab=18):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [" ".join(rng.choice(words, rng.integers(3, 12)))
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def test_word_pair_lift_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _docs()
    out = word_pair_lift(rd.from_arrow(tbl).repartition(5), min_count=5)
    mine = {(r["word_a"], r["word_b"]):
            (r["c_ab"], r["c_a"], r["c_b"], r["lift"])
            for r in out.take_all()}
    oracle = duckdb.sql(_SQL.format(mc=5)).fetchall()
    assert mine == {(a, b): (cab, ca, cb, l)
                    for a, b, cab, ca, cb, l in oracle}
    assert len(mine) > 10


def test_word_pair_lift_hand_fixture(ray_session):
    import ray.data as rd

    # 4 docs: (x,y) co-occur twice, x in 3 docs, y in 2 docs
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["x y", "x y z", "x z", "z q"]),
    })
    out = word_pair_lift(rd.from_arrow(tbl), min_count=2)
    rows = {(r["word_a"], r["word_b"]):
            (r["c_ab"], r["c_a"], r["c_b"], r["lift"])
            for r in out.take_all()}
    assert rows[("x", "y")] == (2, 3, 2, 4 * 2 / (3 * 2))
    assert rows[("x", "z")] == (2, 3, 3, 4 * 2 / (3 * 3))


def test_word_pair_lift_bucketed_df_identical(ray_session):
    """Forced df_broadcast_cap=0 routes through _pair_lift_bucketed
    (the no-driver-df scale path) — values must match the broadcast
    path bit for bit (round-4: the cap used to raise
    NotImplementedError)."""
    import ray.data as rd

    tbl = _docs(seed=9)
    ds = rd.from_arrow(tbl).repartition(5)
    broad = word_pair_lift(ds, min_count=5)
    buck = word_pair_lift(ds, min_count=5, df_broadcast_cap=0)
    key = lambda r: (r["word_a"], r["word_b"])  # noqa: E731
    mb = {key(r): (r["c_ab"], r["c_a"], r["c_b"], r["lift"])
          for r in broad.take_all()}
    mk = {key(r): (r["c_ab"], r["c_a"], r["c_b"], r["lift"])
          for r in buck.take_all()}
    assert mb == mk
    assert len(mk) > 10
