"""Product quantization (stages/knn.train_pq_codebooks / pq_encode /
pq_ann_topk): encode parity vs local argmin, ADC arithmetic vs numpy,
recall vs exact L2 on clustered data."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.knn import (pq_ann_topk, pq_encode,
                                        train_pq_codebooks)


def _clustered(seed=7, n=400, dim=16, n_clusters=10):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(n_clusters, dim))
    pts = centers[rng.integers(0, n_clusters, n)] \
        + rng.normal(scale=0.15, size=(n, dim))
    return pts


def _tbl(pts):
    return pa.table({
        "vec_id": pa.array(range(len(pts)), type=pa.int64()),
        "embedding": pa.array([list(map(float, p)) for p in pts],
                              type=pa.list_(pa.float32())),
    })


def test_pq_encode_matches_local_argmin(ray_session):
    import ray.data as rd

    pts = _clustered()
    tbl = _tbl(pts)
    ds = rd.from_arrow(tbl).repartition(4)
    cb = train_pq_codebooks(ds, dim=16, m=4, ksub=8, iters=2)
    assert cb.shape == (4, 8, 4)
    codes = {r["vec_id"]: np.frombuffer(r["pq_code"], dtype=np.uint8)
             for r in pq_encode(ds, cb).take_all()}
    x = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32) \
        .astype(np.float64).reshape(len(pts), 4, 4)
    for i in range(len(pts)):
        for sub in range(4):
            d = ((cb[sub] - x[i, sub]) ** 2).sum(axis=1)
            assert codes[i][sub] == int(np.argmin(d))


def test_pq_adc_arithmetic(ray_session):
    """With hand-built codebooks, ADC distance must equal the exact L2
    to each row's reconstruction (sum of per-subspace tables)."""
    import ray.data as rd

    pts = _clustered(seed=3, n=60, dim=8)
    tbl = _tbl(pts)
    rng = np.random.default_rng(1)
    cb = rng.normal(size=(2, 4, 4))
    q = pts[:3]
    out = pq_ann_topk(rd.from_arrow(tbl), q, np.arange(3), cb, k=60)
    x = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32) \
        .astype(np.float64).reshape(-1, 2, 4)
    qs = q.reshape(3, 2, 4)
    got = {(r["query_id"], r["vec_id"]): r["adc_dist"]
           for r in out.take_all()}
    for qi in range(3):
        for vi in range(len(pts)):
            d = 0.0
            for sub in range(2):
                code = np.argmin(((cb[sub] - x[vi, sub]) ** 2).sum(axis=1))
                d += ((qs[qi, sub] - cb[sub, code]) ** 2).sum()
            assert abs(got[(qi, vi)] - d) < 1e-9


def test_pq_cluster_recovery(ray_session):
    """Within a PQ cell all points share one code (identical ADC dist),
    so intra-cluster ranking is undefined by design — the meaningful
    approximate-correctness pin is that every returned neighbor comes
    from the query's own well-separated cluster."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    centers = rng.normal(scale=6.0, size=(8, 16))
    labels = rng.integers(0, 8, 500)
    pts = centers[labels] + rng.normal(scale=0.1, size=(500, 16))
    tbl = _tbl(pts)
    ds = rd.from_arrow(tbl).repartition(4)
    cb = train_pq_codebooks(ds, dim=16, m=4, ksub=16, iters=4)
    qsel = np.arange(0, 500, 50)
    got = pq_ann_topk(ds, pts[qsel], np.arange(len(qsel)), cb, k=10)
    mine = {}
    for r in got.take_all():
        mine.setdefault(r["query_id"], []).append(r["vec_id"])
    hits = total = 0
    for qi, src in enumerate(qsel):
        for vid in mine[qi]:
            hits += labels[vid] == labels[src]
            total += 1
    assert total == 10 * len(qsel)
    assert hits / total >= 0.95
