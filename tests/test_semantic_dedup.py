"""SemDeDup semantic dedup (stages/dedup.semantic_dedup) vs a local
numpy replication of the spec: k-means clusters, then keep-first within
cluster under a cosine threshold."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.dedup import semantic_dedup
from osmium_tool_ray.stages.knn import train_ivf_centroids


def _emb_tbl(seed=3, n=240, dim=12):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    # plant exact near-dups: every 10th vector duplicated (scaled) at a
    # higher id, plus a couple of genuinely-close pairs
    ids = list(range(n))
    vecs = [list(map(float, v)) for v in m]
    for i in range(0, n, 10):
        ids.append(10_000 + i)
        vecs.append([float(x * 2.0) for x in m[i]])
    return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                     "embedding": pa.array(vecs,
                                           type=pa.list_(pa.float32()))})


def _local_survivors(tbl, dim, threshold, nlist, cents):
    """Independent keep-first replication over the same centroids."""
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    m = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32) \
        .astype(np.float64)
    en = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    cl = np.argmax(en @ cents.T, axis=1)
    surv = []
    for c in np.unique(cl):
        sel = np.flatnonzero(cl == c)
        sel = sel[np.argsort(ids[sel], kind="stable")]
        kept_rows = []
        for r in sel:
            dup = any(float(en[r] @ en[o]) >= threshold for o in sel
                      if ids[o] < ids[r])
            if not dup:
                kept_rows.append(r)
        surv.extend(ids[r] for r in kept_rows)
    return sorted(surv)


def test_semantic_dedup_vs_local(ray_session):
    import ray.data as rd

    tbl = _emb_tbl()
    dim = 12
    for threshold, nlist in ((0.95, 4), (0.5, 1), (0.6, 4)):
        ds = rd.from_arrow(tbl).repartition(5)
        out = semantic_dedup(ds, dim=dim, threshold=threshold,
                             nlist=nlist, iters=2)
        mine = sorted(r["vec_id"] for r in out.take_all())
        cents = train_ivf_centroids(rd.from_arrow(tbl), dim=dim,
                                    nlist=nlist, iters=2)
        assert mine == _local_survivors(tbl, dim, threshold, nlist, cents)


def test_semantic_dedup_chunked_blockwise(ray_session):
    """chunk smaller than the cluster exercises the blockwise
    exists-earlier scan; results must equal the one-shot path."""
    import ray.data as rd

    tbl = _emb_tbl(seed=8, n=150)
    big = semantic_dedup(rd.from_arrow(tbl), dim=12, threshold=0.55,
                         nlist=2, chunk=100_000)
    small = semantic_dedup(rd.from_arrow(tbl), dim=12, threshold=0.55,
                           nlist=2, chunk=7)
    a = sorted(r["vec_id"] for r in big.take_all())
    b = sorted(r["vec_id"] for r in small.take_all())
    assert a == b
    # planted scaled copies must always be dropped
    assert not any(v >= 10_000 for v in a)
