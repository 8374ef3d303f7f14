"""ann_recall query: recall@5 of IVF vs exact cosine top-5 — bounds,
row-per-query shape, and the exhaustive-probe invariant (nprobe ==
nlist reproduces the exact ranking, recall exactly 1.0)."""
import numpy as np
import pyarrow as pa

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def test_ann_recall_bounds_and_shape(ray_session):
    got = E.queries()["ann_recall"](SF).to_pandas()
    assert len(got) > 0 and got.query_id.is_unique
    assert ((got.recall >= 0) & (got.recall <= 1)).all()
    assert (np.round(got.recall * 5) == got.recall * 5).all()


def test_ann_recall_is_one_at_full_probe(ray_session):
    import pyarrow.parquet as pq
    from osmium_tool_ray.sources.readers import read_parquet_clean
    from osmium_tool_ray.stages.knn import (ann_topk, ivf_ann_topk,
                                            train_ivf_centroids)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy(zero_copy_only=False)
    qsel = t.filter(pa.array(vid % 100 == 0))
    qm = np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64)
    qids = qsel["vec_id"].to_numpy(zero_copy_only=False)
    corpus = read_parquet_clean(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    exact = ann_topk(corpus, qm, qids, k=5, concurrency=2).to_pandas()
    cents = train_ivf_centroids(corpus, dim=qm.shape[1], nlist=8,
                                iters=2)
    full = ivf_ann_topk(corpus, qm, qids, cents, k=5, nprobe=8,
                        concurrency=2).to_pandas()
    e = exact.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert e.vec_id.tolist() == f.vec_id.tolist()
