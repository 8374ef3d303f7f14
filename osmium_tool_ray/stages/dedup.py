"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shapes (per the Ray guide's sketch-merge pattern):
  * exact: vectorized content hash in map_batches -> groupby(hash) ->
    keep lowest id. Only the (hash, id) projection shuffles.
  * MinHash+LSH: per-batch shingle->minhash (numpy, all rows at once) ->
    explode to (band_id, band_hash, doc_id) rows -> groupby bands ->
    candidate pairs -> exact Jaccard verify -> min-label connected
    components (bounded label-propagation rounds).
  * SimHash: 64-bit sign-aggregated token-hash fingerprint; near-dup =
    Hamming distance <= k (verified per candidate bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64, hash_str_u64, splitmix64


def _flat_shingle_hashes(texts: list[str], k: int = 5):
    """All docs' char-k-shingle hashes in ONE flat uint64 array + per-doc
    segment offsets — a single rolling-window pass over the concatenated
    byte buffer (no per-doc Python loop). Cross-document windows are
    dropped via offset arithmetic; docs shorter than k get one sentinel
    hash 0."""
    bufs = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.asarray([len(b) for b in bufs], dtype=np.int64)
    buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    if len(buf) < k:
        flat = np.zeros(len(texts), dtype=np.uint64)
        offs = np.arange(len(texts) + 1, dtype=np.int64)
        return flat, offs
    win = np.lib.stride_tricks.sliding_window_view(buf, k).astype(np.uint64)
    weights = (np.uint64(257) ** np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        h = splitmix64(win @ weights)
    doc_starts = np.concatenate([[0], np.cumsum(lens)])
    counts = np.maximum(lens - k + 1, 1)
    offs = np.concatenate([[0], np.cumsum(counts)])
    flat = np.empty(offs[-1], dtype=np.uint64)
    for i in range(len(texts)):  # cheap per-doc slice copy (memcpy, no hashing)
        if lens[i] < k:
            flat[offs[i]] = 0
        else:
            flat[offs[i]:offs[i + 1]] = h[doc_starts[i]:doc_starts[i] + counts[i]]
    return flat, offs


def _shingle_hashes(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """Per-doc unique shingle-hash sets (used by the exact Jaccard verify)."""
    flat, offs = _flat_shingle_hashes(texts, k)
    return [np.unique(flat[offs[i]:offs[i + 1]]) for i in range(len(texts))]


def minhash_signature(texts: list[str], num_perm: int = 64, k: int = 5,
                      seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures. Permutations are the
    universal-hash family h_i(x) = splitmix64(x ^ salt_i); per-doc minima
    via segmented minimum.reduceat over the flat shingle buffer — fully
    vectorized across all docs of the batch."""
    salts = hash64(np.arange(num_perm, dtype=np.uint64), seed=seed)
    flat, offs = _flat_shingle_hashes(texts, k)
    n = len(texts)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    starts = offs[:-1]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            m = splitmix64(flat ^ salts[p])
            sigs[:, p] = np.minimum.reduceat(m, starts)
    return sigs


class MinHashBands:
    """map_batches stage: emit (doc_id, band_id, band_hash) rows — the LSH
    banding explode. groupby(band_id, band_hash) downstream buckets
    candidates."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, bands: int = 16, k: int = 5, seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k, self.seed = num_perm, bands, k, seed
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sigs = minhash_signature(texts, self.num_perm, self.k, self.seed)
        n = len(texts)
        bh = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            acc = seg[:, 0].copy()
            with np.errstate(over="ignore"):
                for j in range(1, self.rows_per_band):
                    acc = splitmix64(acc ^ seg[:, j])
            bh[:, b] = acc
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.bands)),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
        })


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa = _shingle_hashes([a], k)[0]
    sb = _shingle_hashes([b], k)[0]
    inter = np.intersect1d(sa, sb).size
    union = np.union1d(sa, sb).size
    return inter / union if union else 1.0


def minhash_dedup(docs, text_col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 64, bands: int = 16, k: int = 5,
                  threshold: float = 0.7, concurrency=4):
    """Full MinHash-LSH dedup: returns a Dataset of (doc_id, dup_of) pairs
    where dup_of is the smallest doc id of the near-dup cluster.

    Candidate pairs come from LSH band buckets (groupby shuffle on the
    banded projection only); each candidate pair is verified with exact
    shingle Jaccard against the threshold; clusters are resolved by
    min-label union on the verified pair list (candidate sets are tiny
    relative to the corpus — for adversarial corpora run label-propagation
    rounds as a groupby loop instead)."""
    import ray

    band_rows = docs.map_batches(
        MinHashBands, fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, k=k),
        batch_format="pyarrow", concurrency=concurrency)

    # bucket sizes via a native aggregate (vectorized; most buckets are
    # singletons and never reach Python), then only multi-member buckets'
    # rows are gathered — candidate volume is tiny relative to the corpus
    from ray.data.aggregate import Count

    sizes = band_rows.groupby(["band_id", "band_hash"]) \
        .aggregate(Count(alias_name="n"))
    hot = sizes.filter(expr="n > 1").take_all()
    hot_keys = {(r["band_id"], r["band_hash"]) for r in hot}
    if hot_keys:
        import ray
        href = ray.put(hot_keys)

        def in_hot(batch: pa.Table) -> pa.Table:
            keys = ray.get(href)
            bid = batch["band_id"].to_numpy(zero_copy_only=False)
            bh = batch["band_hash"].to_numpy(zero_copy_only=False)
            m = np.fromiter(((int(b), int(h)) in keys for b, h in zip(bid, bh)),
                            dtype=bool, count=len(bid))
            return batch.filter(pa.array(m))

        rows = band_rows.map_batches(in_hot, batch_format="pyarrow").take_all()
        buckets: dict = {}
        for r in rows:
            buckets.setdefault((r["band_id"], r["band_hash"]), set()).add(r[id_col])
        cand = set()
        for ids_in_bucket in buckets.values():
            ids_sorted = sorted(ids_in_bucket)
            base = ids_sorted[0]
            for other in ids_sorted[1:]:
                cand.add((base, other))
    else:
        cand = set()

    # verify candidates with exact Jaccard (fetch texts of candidate ids only)
    cand_ids = sorted({x for p in cand for x in p})
    if cand_ids:
        from ..pipelines.idops import semi_join
        rows = semi_join(docs.select_columns([id_col, text_col]), id_col,
                         np.asarray(cand_ids, dtype=object)).take_all()
        # shingle each candidate doc ONCE (a doc may appear in many pairs)
        ids_in_order = [r[id_col] for r in rows]
        sets = _shingle_hashes([r[text_col] for r in rows], k)
        set_of = dict(zip(ids_in_order, sets))
        verified = []
        for a, b in cand:
            sa, sb = set_of[a], set_of[b]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            if union == 0 or inter / union >= threshold:
                verified.append((a, b))
    else:
        verified = []

    # min-label union-find over verified pairs
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    out = [(x, find(x)) for x in sorted({i for p in verified for i in p})]
    return pa.table({"doc_id": pa.array([o[0] for o in out]),
                     "dup_of": pa.array([o[1] for o in out])})


class SimHash:
    """map_batches stage: 64-bit SimHash of the token multiset."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        import re
        self.text_col, self.out_col = text_col, out_col
        self.token_re = re.compile(r"[A-Za-z0-9_]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        token_re = self.token_re
        out = np.zeros(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch[self.text_col].astype(str)):
            words = token_re.findall(t.lower())
            if not words:
                continue
            hs = hash_str_u64(words)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = np.bitwise_or.reduce(
                (vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        batch[self.out_col] = out.view(np.int64)
        return batch


def ngram_jaccard_pairs(docs, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5, concurrency=4):
    """Word n-gram Jaccard near-dup: same LSH-banding pipeline as MinHash
    but shingling on word n-grams (token-level, order-sensitive)."""
    return minhash_dedup(docs, text_col=text_col, id_col=id_col,
                         num_perm=64, bands=16, k=4 * n,  # char-window ~ n words
                         threshold=threshold, concurrency=concurrency)


class HyperplaneSig:
    """map_batches actor: b-bit random-hyperplane signature of an embedding
    column (cosine LSH). Hyperplanes are a seeded deterministic matrix
    built once per actor."""

    def __init__(self, dim: int, bits: int = 16, seed: int = 11,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.h = rng.normal(size=(dim, bits))
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.knn import embedding_matrix
        emb = embedding_matrix(batch[self.vec_col])
        if emb.size == 0:
            sig = np.empty(0, dtype=np.int64)
        else:
            bits = (emb @ self.h) > 0
            sig = np.zeros(len(emb), dtype=np.uint64)
            for j in range(bits.shape[1]):
                sig |= bits[:, j].astype(np.uint64) << np.uint64(j)
            sig = sig.view(np.int64)
        return pa.table({self.id_col: batch[self.id_col],
                         "sig": pa.array(sig)})


def embedding_neardup(embeddings, dim: int, threshold: float = 0.95,
                      bits: int = 16, vec_col: str = "embedding",
                      id_col: str = "vec_id", concurrency=4) -> pa.Table:
    """Embedding-cosine near-dup: bucket by the full b-bit hyperplane
    signature (vectors with cosine >= threshold collide with high
    probability at small b), verify exact cosine per candidate pair.
    Returns (id, dup_of) pairs."""
    import ray

    sigs = embeddings.map_batches(
        HyperplaneSig, fn_constructor_args=(dim, bits),
        fn_constructor_kwargs=dict(vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)
    from ray.data.aggregate import Count

    sizes = sigs.groupby("sig").aggregate(Count(alias_name="n"))
    hot = {r["sig"] for r in sizes.filter(expr="n > 1").take_all()}
    if not hot:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "dup_of": pa.array([], type=pa.int64())})
    href = ray.put(np.sort(np.asarray(list(hot), dtype=np.int64)))

    def in_hot(batch: pa.Table) -> pa.Table:
        hs = ray.get(href)
        s = batch["sig"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hs, s)
        pos[pos == len(hs)] = len(hs) - 1
        return batch.filter(pa.array(hs[pos] == s))

    cand_rows = sigs.map_batches(in_hot, batch_format="pyarrow").take_all()
    buckets: dict = {}
    for r in cand_rows:
        buckets.setdefault(r["sig"], []).append(r[id_col])
    cand_ids = sorted({i for ids in buckets.values() for i in ids})
    from ..pipelines.idops import semi_join
    vec_rows = semi_join(embeddings.select_columns([id_col, vec_col]), id_col,
                         np.asarray(cand_ids, dtype=object)).take_all()
    vec_of = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64) for r in vec_rows}

    out_a, out_b = [], []
    for ids in buckets.values():
        ids = sorted(ids)
        base = ids[0]
        vb = vec_of[base]
        vb = vb / max(np.linalg.norm(vb), 1e-30)
        for other in ids[1:]:
            vo = vec_of[other]
            cos = float(vb @ (vo / max(np.linalg.norm(vo), 1e-30)))
            if cos >= threshold:
                out_a.append(other)
                out_b.append(base)
    return pa.table({id_col: pa.array(out_a), "dup_of": pa.array(out_b)})


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64) ^ np.asarray(b).view(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
