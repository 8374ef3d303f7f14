"""Distributed PCA + random projection (stages/projections.py): merged
moments match single-machine numpy exactly; projections preserve what
they should; everything is partitioning-independent."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.projections import (
    project, random_project, random_projection_matrix, train_pca,
)


def _emb_table(seed=17, n=400, d=16):
    rng = np.random.default_rng(seed)
    # anisotropic data: variance concentrated in a few directions
    basis = rng.standard_normal((d, d))
    scales = np.linspace(3.0, 0.05, d)
    x = rng.standard_normal((n, d)) * scales @ basis
    flat = pa.array(x.astype(np.float32).ravel(), type=pa.float32())
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.ListArray.from_arrays(offsets, flat),
    }), x.astype(np.float32).astype(np.float64)


def test_pca_matches_numpy(ray_session):
    import ray.data as rd

    tbl, x = _emb_table()
    mean, comps = train_pca(rd.from_arrow(tbl).repartition(6), d_out=4)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, np.argsort(w)[::-1][:4]].T
    # components match up to sign; compare absolute cosine alignment
    for i in range(4):
        cos = abs(top[i] @ comps[i]) / (
            np.linalg.norm(top[i]) * np.linalg.norm(comps[i]))
        assert cos > 1.0 - 1e-8


def test_pca_partition_independent(ray_session):
    import ray.data as rd

    tbl, _ = _emb_table(seed=23)
    m1, c1 = train_pca(rd.from_arrow(tbl).repartition(2), d_out=3)
    m2, c2 = train_pca(rd.from_arrow(tbl).repartition(9), d_out=3)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(np.abs(c1), np.abs(c2), atol=1e-7)


def test_project_variance_ordering(ray_session):
    import ray.data as rd

    tbl, x = _emb_table(seed=29)
    ds = rd.from_arrow(tbl)
    mean, comps = train_pca(ds, d_out=3)
    out = project(ds, mean, comps)
    rows = sorted(out.take_all(), key=lambda r: r["vec_id"])
    y = np.asarray([r["projected"] for r in rows], dtype=np.float64)
    assert y.shape == (400, 3)
    var = y.var(axis=0)
    assert var[0] >= var[1] >= var[2]
    exact = (x - x.mean(axis=0)) @ comps.T
    assert np.allclose(y, exact, atol=1e-4)  # float32 storage


def test_random_projection_jl(ray_session):
    """Seeded JL projection roughly preserves pairwise distances and is
    identical across workers/partitionings (same seed)."""
    import ray.data as rd

    tbl, x = _emb_table(seed=31, n=120, d=32)
    out = random_project(rd.from_arrow(tbl).repartition(5), 32, 16, seed=9)
    rows = sorted(out.take_all(), key=lambda r: r["vec_id"])
    y = np.asarray([r["projected"] for r in rows], dtype=np.float64)
    m = random_projection_matrix(32, 16, seed=9)
    assert np.allclose(y, x @ m.T, atol=1e-4)
    d_x = np.linalg.norm(x[:30, None] - x[None, :30], axis=2)
    d_y = np.linalg.norm(y[:30, None] - y[None, :30], axis=2)
    mask = d_x > 0
    ratio = d_y[mask] / d_x[mask]
    assert 0.4 < ratio.mean() < 1.6  # loose JL sanity bound


def test_quantize_embeddings_round_trip(ray_session):
    """int8 quantization: reconstruction within the quantization step,
    cosine similarity to the original >= 0.999, scale is the global
    max-|x| regardless of partitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.stages.projections import (
        dequantize_batch, quantize_embeddings,
    )

    rng = np.random.default_rng(44)
    n, d = 600, 16
    m = rng.normal(0, 2, (n, d))
    m[17, 3] = 50.0                     # the global max-|x|
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(m), type=pa.list_(pa.float64())),
    })
    out = quantize_embeddings(rd.from_arrow(tbl).repartition(7))
    got = out.take_all()
    assert len(got) == n
    assert all(abs(r["scale"] - 50.0) < 1e-12 for r in got)
    # reconstruct and compare
    batch = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in got], type=pa.int64()),
        "qvec": pa.array([r["qvec"] for r in got], type=pa.binary()),
        "scale": pa.array([r["scale"] for r in got], type=pa.float64()),
    })
    rec = dequantize_batch(batch["qvec"], batch["scale"], d)
    ids = np.asarray(batch["vec_id"].to_pylist())
    orig = m[ids]
    step = 50.0 / 127.0
    assert np.abs(rec - orig).max() <= step / 2 + 1e-9
    num = (rec * orig).sum(axis=1)
    den = np.linalg.norm(rec, axis=1) * np.linalg.norm(orig, axis=1)
    assert (num / np.maximum(den, 1e-30) > 0.995).mean() > 0.95
