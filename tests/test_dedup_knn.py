import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.dedup import (
    SimHash, hamming64, jaccard, minhash_dedup, minhash_signature,
)
from osmium_tool_ray.stages.knn import ann_topk, spatial_knn


def test_minhash_similarity_tracks_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = a.replace("lazy", "sleepy")
    c = "completely different text with nothing shared at all whatsoever"
    sigs = minhash_signature([a, b, c], num_perm=128)
    sim_ab = (sigs[0] == sigs[1]).mean()
    sim_ac = (sigs[0] == sigs[2]).mean()
    assert sim_ab > 0.6
    assert sim_ac < 0.2
    assert jaccard(a, b) > 0.6 > jaccard(a, c)


def test_minhash_dedup_pipeline(ray_session):
    import ray.data as rd

    base = "some long document text that repeats a lot " * 4
    docs = rd.from_items(
        [{"doc_id": 1, "text": base},
         {"doc_id": 2, "text": base + " tail"},        # near-dup of 1
         {"doc_id": 3, "text": "unrelated content entirely different " * 4},
         {"doc_id": 4, "text": base}])                  # exact dup of 1
    out = minhash_dedup(docs, threshold=0.7, concurrency=2)
    pairs = dict(zip(out["doc_id"].to_pylist(), out["dup_of"].to_pylist()))
    assert pairs.get(2) == 1 and pairs.get(4) == 1
    assert 3 not in pairs


def test_simhash_hamming():
    import pandas as pd

    df = pd.DataFrame({"text": ["the quick brown fox jumps over the lazy dog",
                                "the quick brown fox jumps over the lazy cat",
                                "entirely unrelated words appear here now"]})
    out = SimHash("text")(df)
    h = out["simhash"].to_numpy()
    d_near = hamming64(np.array([h[0]]), np.array([h[1]]))[0]
    d_far = hamming64(np.array([h[0]]), np.array([h[2]]))[0]
    assert d_near < d_far


def test_ann_topk(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(200, 16)).astype(np.float64)
    corpus = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                            for i in range(200)])
    q = vecs[[3, 77]]
    out = ann_topk(corpus, q, np.array([0, 1]), k=5, concurrency=2).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["score"], r["vec_id"]))
    # each query's own vector is its top hit with score ~1
    top0 = max(by_q[0])
    top1 = max(by_q[1])
    assert top0[1] == 3 and abs(top0[0] - 1.0) < 1e-12
    assert top1[1] == 77 and abs(top1[0] - 1.0) < 1e-12
    assert len(by_q[0]) == 5
    # verify against exact numpy top-k
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    exact = np.argsort(-(qn @ vn.T), axis=1)[:, :5]
    got0 = [v for _, v in sorted(by_q[0], reverse=True)]
    assert got0 == exact[0].tolist()


def test_spatial_knn(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    lon = rng.uniform(10, 11, 150)
    lat = rng.uniform(45, 46, 150)
    images = rd.from_items([{"image_id": f"p{i:03d}", "lon": float(lon[i]),
                             "lat": float(lat[i])} for i in range(150)])
    out = spatial_knn(images, k=3, level=10).take_all()
    got = {}
    for r in out:
        got.setdefault(r["image_id"], []).append((r["rank"], r["neighbor_id"], r["dist"]))
    # exact check for a handful of points
    for i in (0, 50, 149):
        d2 = (lon - lon[i]) ** 2 + (lat - lat[i]) ** 2
        order = np.lexsort((np.array([f"p{j:03d}" for j in range(150)]), d2))
        order = [j for j in order if j != i][:3]
        expect = [f"p{j:03d}" for j in order]
        mine = [n for _, n, _ in sorted(got[f"p{i:03d}"])]
        assert mine == expect, f"point {i}: {mine} != {expect}"


def test_spatial_knn_hot_cell(ray_session):
    """One dense urban cell (20k points, all inside a single level-10 cell)
    forced through the hot path: hot_threshold << n engages candidate
    salting (each salt reducer sees ~n/salts candidates, never the whole
    cell) and a tiny query_chunk_floats bounds every distance block to
    ~12.5k floats — no dense q x c allocation. Results must still be
    EXACT vs numpy brute force (per-salt top-k union is a superset of the
    true top-k; the global merge recovers it)."""
    import ray.data as rd

    n = 20_000
    rng = np.random.default_rng(41)
    lon = rng.uniform(10.0, 10.1, n)
    lat = rng.uniform(45.0, 45.1, n)
    ids = np.array([f"q{i:05d}" for i in range(n)])
    images = rd.from_arrow(__import__("pyarrow").table(
        {"image_id": ids, "lon": lon, "lat": lat}))
    out = spatial_knn(images, k=3, level=10, hot_threshold=1000, salts=8,
                      query_chunk_floats=100_000).take_all()
    got = {}
    for r in out:
        got.setdefault(r["image_id"], []).append((r["rank"], r["neighbor_id"]))
    assert len(got) == n
    for i in (0, 1234, 19_999):
        d2 = (lon - lon[i]) ** 2 + (lat - lat[i]) ** 2
        order = np.lexsort((ids, d2))
        expect = [ids[j] for j in order if j != i][:3]
        mine = [nb for _, nb in sorted(got[ids[i]])]
        assert mine == expect, f"point {i}: {mine} != {expect}"


def test_word_ngram_jaccard_pairs(ray_session):
    """True token-level n-gram near-dup: word-order-sensitive shingles
    (doc 2 shares most 3-grams with doc 1; doc 3 shares the vocabulary
    but in scrambled order and must NOT pair at a high threshold)."""
    import ray.data as rd

    from osmium_tool_ray.stages.dedup import ngram_jaccard_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    words = base.split()
    scrambled = " ".join(words[::2] + words[1::2])
    docs = rd.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra tail words here"},
        {"doc_id": 3, "text": scrambled},
    ])
    out = ngram_jaccard_pairs(docs, n=3, threshold=0.6, concurrency=2)
    pairs = set(zip(out["doc_id"].to_pylist(), out["dup_of"].to_pylist()))
    assert (2, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_word_ngram_sets_order_sensitivity():
    from osmium_tool_ray.stages.dedup import _word_ngram_sets

    a, b, c = _word_ngram_sets(
        ["one two three four", "one two three four", "four three two one"], n=2)
    assert np.array_equal(a, b)
    assert np.intersect1d(a, c).size == 0


def test_short_docs_are_not_false_duplicates(ray_session):
    """Docs below the shingle size must NOT all collapse into one
    near-dup cluster (each short doc shingles to the hash of its own
    full text, not a shared sentinel)."""
    import ray.data as rd

    from osmium_tool_ray.stages.dedup import (
        jaccard, minhash_dedup, ngram_jaccard_pairs,
    )

    assert jaccard("hi", "yo", k=5) == 0.0
    assert jaccard("hi", "hi", k=5) == 1.0
    docs = rd.from_items([
        {"doc_id": 1, "text": "hi"},
        {"doc_id": 2, "text": "yo"},
        {"doc_id": 3, "text": "hi"},          # exact dup of 1
    ])
    out = minhash_dedup(docs, threshold=0.7, concurrency=2)
    pairs = dict(zip(out["doc_id"].to_pylist(), out["dup_of"].to_pylist()))
    assert pairs == {3: 1}
    out2 = ngram_jaccard_pairs(docs, n=3, threshold=0.6, concurrency=2)
    pairs2 = dict(zip(out2["doc_id"].to_pylist(), out2["dup_of"].to_pylist()))
    assert pairs2 == {3: 1}
