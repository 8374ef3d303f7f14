"""Dimensionality reduction over embedding columns — distributed PCA and
seeded random projection (graft additions; the reference has no vector
ops, SURVEY.md §2.5 — these feed the ANN/near-dup stages in
stages/knn.py and stages/dedup.py with smaller vectors).

Scale shapes:
  * PCA training is the textbook mergeable-moments reduction: each block
    contributes (n, sum x, sum x x^T) — a (d + d^2)-float partial
    independent of block size — merged on the driver, where the d x d
    eigendecomposition is trivial (d is the embedding dim, O(100)).
    No shuffle; one streaming pass.
  * Projection is a per-batch matmul against the broadcast component
    matrix (ray.put once), emitting fixed-size list<float> columns.
  * Random projection needs no training pass at all: every worker
    regenerates the same Gaussian matrix from the seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .knn import embedding_matrix


def pca_partials(ds, vec_col: str = "embedding"):
    """One streaming pass -> merged (n, sum, sum-outer) moments.

    Per-batch moments emit as flat (key, val) rows — key 0 = count,
    1..d = sum, d+1.. = row-major outer — folded by ONE native Sum
    groupby, so only the constant d*d+d+1 table reaches the driver
    regardless of block count (the IVF keyed-fold shape)."""
    from ray.data.aggregate import Sum

    def fold(batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch[vec_col])
        if x.size == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.float64())})
        d = x.shape[1]
        vals = np.concatenate([[float(x.shape[0])], x.sum(axis=0),
                               (x.T @ x).reshape(-1)])
        return pa.table({"k": pa.array(np.arange(len(vals),
                                                 dtype=np.int64)),
                         "v": pa.array(vals)})

    rows = ds.map_batches(fold, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("v", alias_name="v")).take_all()
    if not rows:
        return 0, None, None
    flat = np.zeros(max(int(r["k"]) for r in rows) + 1)
    for r in rows:
        flat[int(r["k"])] = float(r["v"])
    n = int(round(flat[0]))
    # len(flat) - 1 = d*d + d  =>  d via the quadratic formula
    d = int(round((-1 + (1 + 4 * (len(flat) - 1)) ** 0.5) / 2))
    s = flat[1:d + 1]
    ss = flat[d + 1:].reshape(d, d)
    return n, s, ss


def train_pca(ds, d_out: int, vec_col: str = "embedding"):
    """Fit PCA from the merged moments: mean + top-d_out eigenvectors of
    the covariance (deterministic sign convention: largest-|.| entry of
    each component is positive). Returns (mean, components[d_out, d])."""
    n, s, ss = pca_partials(ds, vec_col)
    if not n:
        raise ValueError("empty dataset")
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:d_out]
    comps = v[:, order].T
    # sign-normalize so results are partitioning-independent
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def project(ds, mean: np.ndarray, components: np.ndarray,
            vec_col: str = "embedding", out_col: str = "projected"):
    """Per-batch (x - mean) @ components^T against the broadcast matrix."""
    import ray

    ref = ray.put((mean, components))

    def apply(batch: pa.Table) -> pa.Table:
        mu, comps = ray.get(ref)
        x = embedding_matrix(batch[vec_col])
        y = (x - mu) @ comps.T if x.size else \
            np.empty((0, comps.shape[0]))
        flat = pa.array(y.ravel(), type=pa.float32())
        offsets = pa.array(
            np.arange(0, (len(y) + 1) * comps.shape[0], comps.shape[0],
                      dtype=np.int32))
        lists = pa.ListArray.from_arrays(offsets, flat)
        return batch.drop_columns([vec_col]).append_column(out_col, lists)

    return ds.map_batches(apply, batch_format="pyarrow")


def random_projection_matrix(d_in: int, d_out: int,
                             seed: int = 0) -> np.ndarray:
    """Seeded Gaussian JL matrix (rows scaled by 1/sqrt(d_out)); every
    worker regenerates it identically — nothing to broadcast."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((d_out, d_in)) / np.sqrt(d_out)


def random_project(ds, d_in: int, d_out: int, seed: int = 0,
                   vec_col: str = "embedding", out_col: str = "projected"):
    def apply(batch: pa.Table) -> pa.Table:
        comps = random_projection_matrix(d_in, d_out, seed)
        x = embedding_matrix(batch[vec_col])
        y = x @ comps.T if x.size else np.empty((0, d_out))
        flat = pa.array(y.ravel(), type=pa.float32())
        offsets = pa.array(
            np.arange(0, (len(y) + 1) * d_out, d_out, dtype=np.int32))
        lists = pa.ListArray.from_arrays(offsets, flat)
        return batch.drop_columns([vec_col]).append_column(out_col, lists)

    return ds.map_batches(apply, batch_format="pyarrow")


def quantize_embeddings(ds, vec_col: str = "embedding",
                        id_col: str = "vec_id"):
    """Symmetric int8 quantization of an embedding column — the vector
    STORAGE scale path (4x smaller than float32, 8x than float64;
    dot-product search over int8 runs in SIMD integer kernels).

    Pass 1 folds the global per-dimension max-|x| with mergeable
    per-block partials (bytes-per-block to the driver, dims x 8 B);
    pass 2 is a stateless map writing q = round(x / scale * 127) clipped
    to [-127, 127], PACKED AS BINARY (Acero rejects list payloads in
    shuffles — CLAUDE.md landmine — and binary blobs pass through
    map-side stages untouched). Returns (id_col, qvec:binary,
    scale:float64); `dequantize_batch` reverses for search."""
    import ray

    from ..stages.knn import embedding_matrix

    def maxabs(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch[vec_col])
        if m.size == 0:
            return pa.table({"mx": pa.array([], type=pa.binary())})
        return pa.table({"mx": pa.array(
            [np.abs(m).max(axis=0).tobytes()], type=pa.binary())})

    parts = ds.map_batches(maxabs, batch_format="pyarrow").take_all()
    if not parts:
        return ds  # empty input: nothing to quantize
    mx = np.frombuffer(parts[0]["mx"], dtype=np.float64).copy()
    for r in parts[1:]:
        mx = np.maximum(mx, np.frombuffer(r["mx"], dtype=np.float64))
    scale = float(np.max(mx)) or 1.0
    sref = ray.put(scale)

    def quant(batch: pa.Table) -> pa.Table:
        s = ray.get(sref)
        m = embedding_matrix(batch[vec_col])
        q = np.clip(np.rint(m / s * 127.0), -127, 127).astype(np.int8)
        n, d = q.shape if q.size else (batch.num_rows, 0)
        offs = np.arange(0, (n + 1) * d, max(d, 1), dtype=np.int32)
        if d == 0:
            offs = np.zeros(n + 1, dtype=np.int32)
        qcol = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(q.tobytes())])
        return pa.table({
            id_col: batch[id_col],
            "qvec": qcol,
            "scale": pa.array(np.full(n, s, dtype=np.float64)),
        })

    return ds.map_batches(quant, batch_format="pyarrow")


def dequantize_batch(qvec_col, scale_col, dim: int) -> np.ndarray:
    """(n, dim) float64 reconstruction of a quantized batch."""
    if isinstance(qvec_col, pa.ChunkedArray):
        qvec_col = qvec_col.combine_chunks()
    arr = qvec_col.cast(pa.large_binary())
    buf = np.frombuffer(arr.buffers()[2], dtype=np.int8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset:arr.offset + len(arr) + 1]
    q = buf[offs[0]:offs[-1]].reshape(len(arr), dim).astype(np.float64)
    s = scale_col.to_numpy(zero_copy_only=False).astype(np.float64)
    return q * (s[:, None] / 127.0)
