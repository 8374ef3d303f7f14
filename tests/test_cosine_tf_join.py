"""cosine_tf_join (stages/dedup.py) vs a brute-force sparse-cosine
reference: cap eligibility, integer dot/norm exactness, threshold
boundary, empty and degenerate inputs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.dedup import cosine_tf_join


def _ref(texts, threshold, df_cap):
    toks = [t.lower().split() for t in texts]
    tf = []
    for ts in toks:
        d = {}
        for w in ts:
            d[w] = d.get(w, 0) + 1
        tf.append(d)
    df = {}
    for d in tf:
        for w in d:
            df[w] = df.get(w, 0) + 1
    elig = {w for w, c in df.items() if 2 <= c <= df_cap}
    vec = [{w: c for w, c in d.items() if w in elig} for d in tf]
    out = {}
    for i in range(len(vec)):
        for j in range(i + 1, len(vec)):
            dot = sum(c * vec[j].get(w, 0) for w, c in vec[i].items())
            if dot == 0:
                continue
            na = sum(c * c for c in vec[i].values())
            nb = sum(c * c for c in vec[j].values())
            cos = float(dot) / (np.sqrt(float(na)) * np.sqrt(float(nb)))
            if cos >= threshold:
                out[(i, j)] = (dot, cos)
    return out


def _run(texts, threshold, df_cap, **kw):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts)})
    res = cosine_tf_join(rd.from_arrow(tbl).repartition(3),
                         threshold=threshold, df_cap=df_cap, **kw)
    df = res.to_pandas()
    return {(int(r.id_a), int(r.id_b)): (int(r.dot), float(r.cos))
            for r in df.itertuples()}


def test_cosine_tf_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    vocab = ["hash", "join", "scan", "row", "col", "rare1", "rare2"]
    p = np.array([0.3, 0.25, 0.2, 0.1, 0.1, 0.03, 0.02])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25), p=p))
             for _ in range(50)]
    texts += ["", "rare1 rare1 rare2", "rare1 rare1 rare2"]  # planted
    got = _run(texts, threshold=0.7, df_cap=30)
    want = _ref(texts, 0.7, 30)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12
    # the planted identical docs must pair at cos ~1.0 (sqrt(n)*sqrt(n)
    # rounds one ulp below n for some n — identical in both engines)
    n = len(texts)
    assert got[(n - 2, n - 1)][1] > 1.0 - 1e-12


def test_cosine_tf_join_cap_excludes_stopwords(ray_session):
    # 'the' appears in every doc -> df over cap -> pairs only via rare
    texts = ["the alpha", "the alpha", "the beta", "the beta", "the"]
    got = _run(texts, threshold=0.5, df_cap=3)
    assert set(got) == {(0, 1), (2, 3)}
    assert all(v[1] == 1.0 for v in got.values())


def test_cosine_tf_join_empty(ray_session):
    assert _run(["", "x", "y"], 0.5, 10) == {}


def test_cosine_tf_join_bucketed_parity(ray_session):
    """Forced scale path: elig_broadcast_cap=0 routes every eligible
    word through the word-hash semi-join + doc-hash norm fold. Must be
    bit-identical to the broadcast path (integer partials both ways)."""
    rng = np.random.default_rng(7)
    vocab = ["hash", "join", "scan", "row", "col", "rare1", "rare2"]
    p = np.array([0.3, 0.25, 0.2, 0.1, 0.1, 0.03, 0.02])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25), p=p))
             for _ in range(50)]
    texts += ["", "rare1 rare1 rare2", "rare1 rare1 rare2"]
    broad = _run(texts, threshold=0.7, df_cap=30)
    bucketed = _run(texts, threshold=0.7, df_cap=30,
                    elig_broadcast_cap=0)
    assert set(bucketed) == set(broad)
    for k in broad:
        assert bucketed[k][0] == broad[k][0]
        assert bucketed[k][1] == broad[k][1]  # bit-identical floats
    want = _ref(texts, 0.7, 30)
    assert set(bucketed) == set(want)


def test_cosine_tf_join_bucketed_stopword_cap(ray_session):
    got = _run(["the alpha", "the alpha", "the beta", "the beta", "the"],
               threshold=0.5, df_cap=3, elig_broadcast_cap=0)
    assert set(got) == {(0, 1), (2, 3)}
    assert all(v[1] == 1.0 for v in got.values())


def test_cosine_tf_join_bucketed_empty(ray_session):
    assert _run(["", "x", "y"], 0.5, 10, elig_broadcast_cap=0) == {}
