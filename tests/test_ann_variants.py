import numpy as np
import pytest

from osmium_tool_ray.stages.dedup import embedding_neardup
from osmium_tool_ray.stages.knn import ann_topk, ivf_ann_topk, train_ivf_centroids


@pytest.fixture(scope="module")
def emb_corpus(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    base = rng.normal(size=(50, 32))
    rows = []
    vid = 0
    for i in range(50):
        rows.append({"vec_id": vid, "embedding": base[i].tolist()})
        vid += 1
    # 10 near-duplicates: tiny perturbations of the first 10
    for i in range(10):
        v = base[i] + rng.normal(scale=0.01, size=32)
        rows.append({"vec_id": vid, "embedding": v.tolist()})
        vid += 1
    return rd.from_items(rows), base


def test_embedding_neardup(emb_corpus):
    corpus, base = emb_corpus
    out = embedding_neardup(corpus, dim=32, threshold=0.98, bits=12,
                            concurrency=2)
    pairs = dict(zip(out["vec_id"].to_pylist(), out["dup_of"].to_pylist()))
    # most perturbed copies collide with their source (LSH recall < 1 at 12
    # bits, but perturbations this small should nearly always land together)
    found = sum(1 for i in range(10) if pairs.get(50 + i) == i)
    assert found >= 7


def test_ivf_matches_bruteforce_mostly(emb_corpus):
    corpus, base = emb_corpus
    cents = train_ivf_centroids(corpus, dim=32, nlist=4, iters=2)
    assert cents.shape == (4, 32)
    q = base[[3, 20]]
    qids = np.array([0, 1])
    exact = ann_topk(corpus, q, qids, k=5, concurrency=2).take_all()
    approx = ivf_ann_topk(corpus, q, qids, cents, k=5, nprobe=4,
                          concurrency=2).take_all()
    # nprobe == nlist -> no pruning -> identical to brute force
    key = lambda rows: sorted((r["query_id"], r["vec_id"], round(r["score"], 12))
                              for r in rows)
    assert key(approx) == key(exact)
    # pruned probe still finds the query vector itself as top hit
    approx1 = ivf_ann_topk(corpus, q, qids, cents, k=5, nprobe=1,
                           concurrency=2).take_all()
    tops = {}
    for r in approx1:
        cur = tops.get(r["query_id"])
        if cur is None or r["score"] > cur[0]:
            tops[r["query_id"]] = (r["score"], r["vec_id"])
    assert tops[0][1] == 3 and tops[1][1] == 20
