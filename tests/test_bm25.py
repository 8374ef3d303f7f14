"""bm25_topk (stages/text.py) vs a brute-force BM25 reference over
synthetic docs: scores, ranks, tie order, short/empty docs, terms
absent from the corpus."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.text import bm25_topk

K1, B = 1.5, 0.75


def _ref(texts, terms, topk):
    toks = [t.lower().split() for t in texts]
    dl = np.array([len(ts) for ts in toks], dtype=np.float64)
    nn = float(len(texts))
    avgdl = dl.sum() / nn
    out = []
    for term in sorted(set(terms)):
        df = float(sum(term in ts for ts in toks))
        if df == 0:
            continue
        idf = (nn - df + 0.5) / (df + 0.5)
        rows = []
        for i, ts in enumerate(toks):
            tf = float(ts.count(term))
            if tf == 0:
                continue
            s = idf * ((tf * (K1 + 1.0))
                       / (tf + K1 * ((1.0 - B) + B * (dl[i] / avgdl))))
            rows.append((-s, i, s))
        rows.sort()
        for r, (_, i, s) in enumerate(rows[:topk], 1):
            out.append((term, i, s, r))
    return out


def _run(texts, terms, topk=5):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts)})
    res = bm25_topk(rd.from_arrow(tbl).repartition(3), terms,
                    topk=topk)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    return sorted((r.term, int(r.doc_id), float(r.score), int(r.rank))
                  for r in df.itertuples())


def test_bm25_matches_bruteforce(ray_session):
    rng = np.random.default_rng(9)
    vocab = ["hash", "join", "scan", "row", "col", "x", "y"]
    texts = [" ".join(rng.choice(vocab,
                                 size=rng.integers(0, 30)))
             for _ in range(60)]
    texts += ["", "hash", "hash hash hash join"]
    got = _run(texts, ["hash", "join", "zebra"], topk=5)
    want = sorted(_ref(texts, ["hash", "join", "zebra"], 5))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3]
        assert abs(g[2] - w[2]) < 1e-12


def test_bm25_tie_order_and_topk_cut(ray_session):
    # identical docs -> identical scores; ties break by doc_id ASC
    texts = ["join scan"] * 7
    got = _run(texts, ["join"], topk=3)
    assert [(g[1], g[3]) for g in got] == [(0, 1), (1, 2), (2, 3)]
