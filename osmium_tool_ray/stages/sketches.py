"""Mergeable sketches — approximate aggregates for 100-TB-scale profiling
(build brief: "a novel sketch" as a custom operator; the reference keeps
only exact counts, SURVEY.md §2.5, so these are graft additions).

HyperLogLog distinct count: the canonical mergeable sketch. Each block
folds its rows into 2^p max-registers map-side (one vectorized pass, no
Python loop); the shuffle payload is ONE register row of 2^p bytes per
block, merged by elementwise max — the same partial+final shape as
tags-count, but with constant-size partials regardless of cardinality.
At p=14 the standard error is 1.04/sqrt(2^14) ~ 0.8%.

Estimator: Flajolet et al.'s HLL with the standard alpha_m bias constant
and linear-counting fallback for the small range (the widely published
formulation; no external library)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_str_u64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(values, p: int = 14, seed: int = 0) -> np.ndarray:
    """Fold a string array into 2^p HLL max-registers (uint8)."""
    m = 1 << p
    h = hash_str_u64(values, seed=seed)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rank = leading zeros of the remaining 64-p bits, +1 (<= 64-p+1)
    # via bit_length: leading_zeros = 64 - bit_length
    bl = np.zeros(len(h), dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        v[big] >>= np.uint64(shift)
    bl += (v >= 1).astype(np.int64)
    rank = (64 - bl + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate from merged registers (alpha_m * m^2 / sum
    2^-reg, with linear counting when E <= 2.5m and zeros exist)."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str, p: int = 14, seed: int = 0,
                 merge_buckets: int = 32) -> float:
    """Approximate COUNT(DISTINCT col) over a Dataset. Map-side register
    fold per block, then a bucketed INTERMEDIATE max-merge (register max
    is lossless, so the two-level fold is exact): the driver sees at most
    `merge_buckets` x 2^p bytes regardless of block count, not
    n_blocks x 2^p."""
    def fold(batch: pa.Table) -> pa.Table:
        regs = hll_registers(batch[col].cast(pa.string()), p=p, seed=seed)
        b = int(regs.sum()) % merge_buckets  # any balanced det. assignment
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          type=pa.binary()),
                         "_b": pa.array([b], type=pa.int32())})

    def merge_group(g: pa.Table) -> pa.Table:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for rb in g["regs"].to_pylist():
            acc = np.maximum(acc, np.frombuffer(rb, dtype=np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()],
                                          type=pa.binary())})

    parts = ds.map_batches(fold, batch_format="pyarrow") \
        .groupby("_b").map_groups(merge_group, batch_format="pyarrow") \
        .take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in parts:
        merged = np.maximum(merged, np.frombuffer(r["regs"], dtype=np.uint8))
    return hll_estimate(merged)


# ---------------------------------------------------------------------------
# Bloom filter — the membership sketch. The reference's id sets are exact
# in-RAM bitsets (IdSetDense, man/osmium-extract.md:382-387: n_extracts x
# max_id/8 bytes); a Bloom filter is the distributed stand-in when the
# wanted-id universe is too large to broadcast exactly but a fixed-size
# bitmap is cheap to ship to every map task. Standard Bloom formulation
# (Bloom 1970; k independent seeded hashes over n_bits).
# ---------------------------------------------------------------------------


def bloom_fold(values, n_bits: int, k: int = 4, seed: int = 0) -> np.ndarray:
    """Fold a string array into a packed-uint64 Bloom bitmap (n_bits//64
    words). One vectorized pass per hash seed; no per-row Python."""
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    for i in range(k):
        h = hash_str_u64(values, seed=seed + i) % np.uint64(n_bits)
        np.bitwise_or.at(words, (h >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (h & np.uint64(63)))
    return words


def bloom_might_contain(words: np.ndarray, values, n_bits: int, k: int = 4,
                        seed: int = 0) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (FP possible),
    False = DEFINITELY absent (no false negatives)."""
    n = len(values) if hasattr(values, "__len__") else values.length()
    hit = np.ones(n, dtype=bool)
    for i in range(k):
        h = hash_str_u64(values, seed=seed + i) % np.uint64(n_bits)
        bit = (words[(h >> np.uint64(6)).astype(np.int64)]
               >> (h & np.uint64(63))) & np.uint64(1)
        hit &= bit.astype(bool)
        if not hit.any():
            break
    return hit


def bloom_build(ds, col: str, n_bits: int = 1 << 20, k: int = 4,
                seed: int = 0) -> np.ndarray:
    """Distributed Bloom build over a Dataset column: per-block bitmap
    partials OR-merged through a tree of zero-copy Ray tasks, so the
    driver receives ONE bitmap regardless of block count (the per-block
    partial is constant-size like hll_distinct's registers, but at
    n_bits=2^26 a flat driver collect would be blocks x 8 MB — the tree
    keeps reduce fan-in bounded at 8)."""
    import ray

    def fold(batch: pa.Table) -> pa.Table:
        w = bloom_fold(batch[col].cast(pa.string()), n_bits, k=k, seed=seed)
        return pa.table({"words": pa.array([w.tobytes()], type=pa.binary())})

    parts = ds.map_batches(fold, batch_format="pyarrow")

    @ray.remote(num_cpus=0.5)
    def or_merge(*tables) -> pa.Table:
        acc = np.zeros(n_bits >> 6, dtype=np.uint64)
        for t in tables:
            # empty input datasets emit zero-column blocks (see CLAUDE.md)
            if "words" not in t.schema.names:
                continue
            for row in t["words"].to_pylist():
                acc |= np.frombuffer(row, dtype=np.uint64)
        return pa.table({"words": pa.array([acc.tobytes()], type=pa.binary())})

    refs = parts.to_arrow_refs()
    if not refs:
        return np.zeros(n_bits >> 6, dtype=np.uint64)
    while len(refs) > 1:
        refs = [or_merge.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    merged = ray.get(refs[0])
    if "words" not in merged.schema.names or merged.num_rows == 0:
        return np.zeros(n_bits >> 6, dtype=np.uint64)
    return np.frombuffer(merged["words"][0].as_py(), dtype=np.uint64).copy()


# ---------------------------------------------------------------------------
# Heavy hitters — Misra-Gries candidate pass + exact verify. The reference
# computes tag frequencies with one ~16 GB driver hash map
# (man/osmium-tags-count.md:130); at 10^12 rows even the distributed
# groupby shuffles every distinct key. For threshold queries ("values in
# >= f of all rows") the MG summary bounds the shuffle to k values per
# block with a no-miss guarantee (Misra & Gries 1982; mergeability per
# Agarwal et al., "Mergeable Summaries", PODS 2012).
# ---------------------------------------------------------------------------


def mg_survivors(values, k: int):
    """Per-block Misra-Gries survivor set: the values whose block count
    exceeds the (k+1)-th largest count (all values when <= k distinct).

    Guarantee used downstream: a value with block count > n_b/(k+1)
    always survives, so any GLOBAL heavy hitter (total count >
    N/(k+1)) survives in at least one block (pigeonhole)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    vc = values.value_counts()
    vals = vc.field("values")
    counts = vc.field("counts").to_numpy(zero_copy_only=False)
    if len(counts) <= k:
        return vals, counts
    t = np.partition(counts, len(counts) - 1 - k)[len(counts) - 1 - k]
    keep = counts > t
    return vals.filter(pa.array(keep)), counts[keep]


def heavy_hitters(ds, col: str, min_frac: float = 0.01, k: int | None = None,
                  count_col: str = "cnt"):
    """Exact values occurring in >= ceil(min_frac * N) of the rows,
    without a full-key shuffle.

    Pass 1 (candidates): per-block MG survivors, <= k values/block,
    dedup'd DISTRIBUTED through the coarse-bucket distinct
    (blocks.hash_distinct) so the driver receives only the candidate
    SET — |distinct survivors| rows, not k x blocks. k defaults to
    ceil(2/min_frac) so the MG no-miss guarantee strictly covers the
    threshold.
    Pass 2 (exact): candidate set broadcast via ray.put; each block
    counts ONLY candidate values map-side; a native groupby-sum over
    (candidate, partial) pairs — the shuffle is |candidates| x blocks
    rows instead of |distinct keys| x rows.

    Returns a Dataset(col, count_col) of the verified heavy hitters."""
    import ray
    import ray.data as rd

    if k is None:
        k = int(np.ceil(2.0 / min_frac))

    def fold(batch: pa.Table) -> pa.Table:
        vals, _ = mg_survivors(batch[col].cast(pa.string()), k)
        # one null-value row guarantees the block's row count ships even
        # when the survivor set is empty (all-ties corner: >k distinct
        # values sharing one count leaves no count strictly above t)
        v = pa.concat_arrays([vals.cast(pa.string()).combine_chunks()
                              if isinstance(vals, pa.ChunkedArray)
                              else vals.cast(pa.string()),
                              pa.nulls(1, pa.string())])
        n = pa.array([0] * len(vals) + [batch.num_rows], type=pa.int64())
        return pa.table({col: v, "_n": n})

    from ..blocks import hash_distinct

    parts = ds.map_batches(fold, batch_format="pyarrow").materialize()
    total = int(parts.sum("_n") or 0)
    def _drop_null(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return b.filter(_pc.is_valid(b[col])).select([col])

    nonnull = parts.map_batches(_drop_null, batch_format="pyarrow")
    cand = np.unique(np.asarray(
        [r[col] for r in hash_distinct(nonnull, [col]).take_all()],
        dtype=object))
    min_count = int(np.ceil(min_frac * total))
    if len(cand) == 0:
        return rd.from_arrow(pa.table({col: pa.array([], type=pa.string()),
                                       count_col: pa.array([], type=pa.int64())}))
    cand_ref = ray.put(np.sort(cand.astype(str)))   # U-dtype: fast searchsorted

    def count_cand(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        v = batch[col].cast(pa.string())
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vc = v.value_counts()
        vals = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cs, vals.astype(str))
        pos_c = np.clip(pos, 0, len(cs) - 1)
        m = cs[pos_c] == vals
        return pa.table({col: pa.array(vals[m], type=pa.string()),
                         "_c": pa.array(counts[m], type=pa.int64())})

    import pyarrow.compute as pc

    summed = ds.map_batches(count_cand, batch_format="pyarrow") \
        .groupby(col).sum("_c")
    sum_name = "sum(_c)"

    def finish(batch: pa.Table) -> pa.Table:
        if sum_name not in batch.schema.names:      # empty-block hygiene
            return pa.table({col: pa.array([], type=pa.string()),
                             count_col: pa.array([], type=pa.int64())})
        keep = pc.greater_equal(batch[sum_name], min_count)
        out = batch.filter(keep)
        return pa.table({col: out[col].cast(pa.string()),
                         count_col: out[sum_name].cast(pa.int64())})

    return summed.map_batches(finish, batch_format="pyarrow")


def approx_quantiles(ds, value_col: str, qs, k_per_block: int = 256):
    """Mergeable approximate-quantile sketch — the constant-space
    complement to pipelines/stats.exact_quantiles (which pays a full
    sort): each block contributes a SORTED STRIDE SAMPLE with weights (a
    one-level GK/KLL-style compactor, <= k_per_block rows per block), the
    weighted samples are folded into a CDF, and each requested quantile
    reads the first value whose cumulative weight crosses q*N.

    Rank-error bound: a block of n rows sampled at stride s = ceil(n/k)
    misplaces any rank by < s, so the folded estimate is within
    sum(ceil(n_b/k)) ~= N/k ranks of exact — pick k for the tolerance,
    independent of N. Past `merge_threshold` partial rows a bucketed
    intermediate compaction re-strides each bucket's weighted sample
    back down to k rows (one more <= N/k rank error — still O(N/k)
    total), so the driver fold is bounded at buckets x k rows at any
    block count. Returns a pyarrow Table (q, value)."""
    import numpy as np

    merge_threshold = 64 * k_per_block
    merge_buckets = 32

    def _stride_sample(v: np.ndarray, w: np.ndarray, k: int):
        """Weighted stride compaction: pick rows every total/k weight
        mass (v must be sorted); weights re-sum exactly to w.sum()."""
        cw = np.cumsum(w)
        total = int(cw[-1])
        stride = max(1, -(-total // k))
        targets = np.arange(stride // 2, total, stride)
        idx = np.searchsorted(cw, targets + 1)
        idx = np.unique(np.minimum(idx, len(v) - 1))
        ow = np.diff(np.concatenate([[0], cw[idx]]))
        ow[-1] += total - int(cw[idx][-1])
        return v[idx], ow.astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        v = np.sort(v[~np.isnan(v)]) if v.dtype.kind == "f" else np.sort(v)
        n = len(v)
        if n == 0:
            return pa.table({"v": pa.array([], type=pa.float64()),
                             "w": pa.array([], type=pa.int64())})
        stride = max(1, -(-n // k_per_block))
        idx = np.arange(stride // 2, n, stride)
        w = np.full(len(idx), stride, dtype=np.int64)
        # make weights sum exactly to n (the tail sample covers the rest)
        w[-1] = n - stride * (len(idx) - 1)
        return pa.table({"v": pa.array(v[idx].astype(np.float64)),
                         "w": pa.array(w)})

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if parts.count() > merge_threshold:
        def bucket(batch: pa.Table) -> pa.Table:
            b = (np.arange(batch.num_rows) + batch.num_rows) \
                % merge_buckets  # spread rows evenly, deterministic
            return batch.append_column("_b", pa.array(b.astype(np.int32)))

        def compact(g: pa.Table) -> pa.Table:
            v = g["v"].to_numpy(zero_copy_only=False)
            w = g["w"].to_numpy(zero_copy_only=False)
            o = np.argsort(v, kind="stable")
            cv, cw2 = _stride_sample(v[o], w[o], k_per_block)
            return pa.table({"v": pa.array(cv), "w": pa.array(cw2)})

        parts = parts.map_batches(bucket, batch_format="pyarrow") \
            .groupby("_b").map_groups(compact, batch_format="pyarrow")
    from ..blocks import bounded_rows
    rows = bounded_rows(parts, 4 * merge_threshold,
                        "weighted-quantile sketch fold")
    if not rows:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    v = np.asarray([r["v"] for r in rows], dtype=np.float64)
    w = np.asarray([r["w"] for r in rows], dtype=np.int64)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1]
    out = []
    for q in qs:
        target = max(1, int(np.ceil(q * total)))
        out.append(v[np.searchsorted(cw, target)])
    return pa.table({"q": pa.array(np.asarray(qs, dtype=np.float64)),
                     "value": pa.array(np.asarray(out))})


def hll_distinct_per_key(ds, key_col: str, col: str, p: int = 12,
                         seed: int = 0):
    """Grouped HLL — approximate COUNT(DISTINCT col) PER KEY in constant
    space per (block, key): each batch emits one (key, registers) row
    per batch-distinct key, the registers are merged per key with an
    elementwise max inside groupby(key).map_groups, and the estimate is
    read off the merged registers. Use when the per-key value domains
    are too large for the exact distinct_per_key pair shuffle.

    Returns (key_col, n_est:float64)."""
    import numpy as np

    m = 1 << p

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], batch.schema
                                               .field(key_col).type),
                             "regs": pa.array([], type=pa.binary())})
        keys = np.asarray(batch[key_col].to_pylist())
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        vals = batch[col].cast(pa.string()).take(
            pa.array(order, type=pa.int64()))
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        ends = np.concatenate([starts[1:], [len(ks)]])
        out_k, out_r = [], []
        for s, e in zip(starts, ends):
            out_k.append(ks[s])
            out_r.append(hll_registers(vals.slice(s, e - s),
                                       p=p, seed=seed).tobytes())
        return pa.table({key_col: pa.array(list(out_k),
                                           type=batch.schema
                                           .field(key_col).type),
                         "regs": pa.array(out_r, type=pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        # multi-key segmented register max: ONE (rows, m) matrix +
        # np.maximum.reduceat per bucket (group_by_key_bucket pays
        # Python per partition, not per key)
        if g.num_rows == 0 or key_col not in g.schema.names:
            return pa.table({key_col: pa.array([], key_type),
                             "n_est": pa.array([], type=pa.float64())})
        keys = np.asarray(g[key_col].to_pylist())
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        mat = np.frombuffer(b"".join(g["regs"].to_pylist()),
                            dtype=np.uint8).reshape(-1, m)[order]
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        acc = np.maximum.reduceat(mat, starts, axis=0)
        est = [hll_estimate(acc[i]) for i in range(len(starts))]
        return pa.table({key_col: pa.array(ks[starts].tolist(),
                                           type=key_type),
                         "n_est": pa.array(est, type=pa.float64())})

    from ..blocks import group_by_key_bucket

    narrow = ds.select_columns([key_col, col])
    sch = narrow.schema()
    key_type = dict(zip(sch.names, sch.types))[key_col]
    return group_by_key_bucket(
        narrow.map_batches(fold, batch_format="pyarrow"), key_col, merge)


def approx_quantiles_per_key(ds, key_col: str, value_col: str, qs,
                             k_per_block: int = 128):
    """Grouped approximate quantiles — the per-key form of
    approx_quantiles (constant space per (block, key); use when a
    per-key exact sort is too much). Each batch emits one (key, sorted
    stride sample + weights) row per batch-distinct key; a
    groupby(key).map_groups folds each key's samples into a weighted
    CDF and reads the requested quantiles. Same N_key/k rank-error
    bound as the global form, per key.

    Returns a Dataset (key_col, q:float64, value:float64)."""
    import numpy as np

    qs = list(qs)

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], batch.schema
                                               .field(key_col).type),
                             "v": pa.array([], type=pa.binary()),
                             "w": pa.array([], type=pa.binary())})
        keys = np.asarray(batch[key_col].to_pylist())
        vals = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.lexsort((vals, keys))
        ks, vs = keys[order], vals[order]
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        ends = np.concatenate([starts[1:], [len(ks)]])
        out_k, out_v, out_w = [], [], []
        for s, e in zip(starts, ends):
            v = vs[s:e]
            n = len(v)
            stride = max(1, -(-n // k_per_block))
            idx = np.arange(stride // 2, n, stride)
            w = np.full(len(idx), stride, dtype=np.int64)
            w[-1] = n - stride * (len(idx) - 1)
            out_k.append(ks[s])
            out_v.append(v[idx].tobytes())
            out_w.append(w.tobytes())
        return pa.table({key_col: pa.array(list(out_k),
                                           type=batch.schema
                                           .field(key_col).type),
                         "v": pa.array(out_v, type=pa.binary()),
                         "w": pa.array(out_w, type=pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], qk_type),
                          "q": pa.array([], type=pa.float64()),
                          "value": pa.array([], type=pa.float64())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        keys = np.asarray(g[key_col].to_pylist())
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        ends = np.concatenate([starts[1:], [len(ks)]])
        out_k, out_q, out_v = [], [], []
        for s, e in zip(starts, ends):
            v = np.concatenate([
                np.frombuffer(g["v"][int(order[i])].as_py(),
                              dtype=np.float64)
                for i in range(s, e)])
            w = np.concatenate([
                np.frombuffer(g["w"][int(order[i])].as_py(),
                              dtype=np.int64)
                for i in range(s, e)])
            so = np.argsort(v, kind="stable")
            v, w = v[so], w[so]
            cw = np.cumsum(w)
            total = cw[-1]
            for q in qs:
                target = max(1, int(np.ceil(q * total)))
                out_k.append(ks[s])
                out_q.append(q)
                out_v.append(v[np.searchsorted(cw, target)])
        return pa.table({key_col: pa.array(list(out_k),
                                           type=qk_type),
                         "q": pa.array(out_q, type=pa.float64()),
                         "value": pa.array(out_v, type=pa.float64())})

    from ..blocks import group_by_key_bucket

    narrow = ds.select_columns([key_col, value_col])
    _s = narrow.schema()
    qk_type = dict(zip(_s.names, _s.types))[key_col]
    return group_by_key_bucket(
        narrow.map_batches(fold, batch_format="pyarrow"), key_col, merge)


def heavy_hitters_per_key(ds, key_col: str, col: str, min_frac: float = 0.02,
                          k: int | None = None, count_col: str = "cnt"):
    """Per-key heavy hitters — exact values occurring in >= ceil(min_frac
    * N_key) of each key's rows (top terms per language, frequent tags
    per region), without shuffling the full (key, value) space.

    Same two-pass shape as heavy_hitters, applied per key:
      1. candidates: per-block Misra-Gries survivors WITHIN each key
         (vectorized: one (key, value) lexsort for block counts + one
         (key, -count) lexsort for the per-key (k+1)-th threshold), then
         coarse-bucket distinct — the per-key pigeonhole keeps the
         no-miss guarantee (a value with within-key count > N_key/(k+1)
         survives in some block);
      2. exact verify: candidate pairs broadcast as one sorted composite
         array, each block counts only candidates map-side, one native
         groupby Sum; per-key totals come from a narrow Count groupby
         and broadcast (|keys| rows).
    Returns a Dataset(key_col, col, count_col:int64)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..blocks import hash_distinct

    if k is None:
        k = int(np.ceil(2.0 / min_frac))

    SEP = "\x1f"  # numpy U-dtype strips trailing \x00, breaking the composite

    def survivors(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].to_pylist(), dtype=str)
        vals = np.asarray(batch[col].to_pylist(), dtype=str)
        if not len(keys):
            return pa.table({key_col: pa.array([], type=pa.string()),
                             col: pa.array([], type=pa.string())})
        o = np.lexsort((vals, keys))
        ks, vs = keys[o], vals[o]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(ks)))
        gk, gv = ks[starts], vs[starts]
        # per-key (k+1)-th largest count as the MG threshold
        o2 = np.lexsort((-cnt, gk))
        gk2 = gk[o2]
        newk = np.ones(len(gk2), dtype=bool)
        newk[1:] = gk2[1:] != gk2[:-1]
        first = np.maximum.accumulate(
            np.where(newk, np.arange(len(gk2)), 0))
        rank = np.arange(len(gk2)) - first          # 0-based within key
        thr = np.full(len(gk2), -1, dtype=np.int64)
        kth = rank == k                             # the (k+1)-th entry
        # threshold per key = count of its (k+1)-th entry (keys with <= k
        # distinct values keep everything: thr stays -1)
        cnt2 = cnt[o2]
        thr_per_first = np.zeros(len(gk2), dtype=np.int64) - 1
        np.maximum.at(thr_per_first, first[kth], cnt2[kth])
        thr = thr_per_first[first]
        keep = cnt2 > thr
        sel = o2[keep]
        return pa.table({key_col: pa.array(gk[sel], type=pa.string()),
                         col: pa.array(gv[sel], type=pa.string())})

    narrow = ds.select_columns([key_col, col])
    cand_rows = hash_distinct(
        narrow.map_batches(survivors, batch_format="pyarrow"),
        [key_col, col]).take_all()
    if not cand_rows:
        return rd.from_arrow(pa.table({
            key_col: pa.array([], type=pa.string()),
            col: pa.array([], type=pa.string()),
            count_col: pa.array([], type=pa.int64())}))
    cand = np.sort(np.asarray(
        [f"{r[key_col]}{SEP}{r[col]}" for r in cand_rows], dtype=str))
    cand_ref = ray.put(cand)

    def tot_partial(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch[key_col].to_pylist(), dtype=str)
        uk, c = np.unique(ks, return_counts=True)
        return pa.table({key_col: pa.array(uk, type=pa.string()),
                         "_n": pa.array(c.astype(np.int64))})

    # per-key totals pre-aggregate per batch, so the groupby shuffles
    # |keys| x blocks rows, never the raw token stream
    totals = {r[key_col]: int(r["_n"])
              for r in narrow.map_batches(tot_partial,
                                          batch_format="pyarrow")
              .groupby(key_col).aggregate(Sum("_n", alias_name="_n"))
              .take_all()}
    min_of = {kk: int(np.ceil(min_frac * n)) for kk, n in totals.items()}
    min_ref = ray.put(min_of)

    def count_cand(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        keys = np.asarray(batch[key_col].to_pylist(), dtype=str)
        vals = np.asarray(batch[col].to_pylist(), dtype=str)
        comp = np.char.add(np.char.add(keys, SEP), vals)
        pos = np.searchsorted(cs, comp)
        pos_c = np.minimum(pos, len(cs) - 1)
        hit = (pos < len(cs)) & (cs[pos_c] == comp)
        if not hit.any():
            return pa.table({key_col: pa.array([], type=pa.string()),
                             col: pa.array([], type=pa.string()),
                             "_c": pa.array([], type=pa.int64())})
        hk, hv = keys[hit], vals[hit]
        o = np.lexsort((hv, hk))
        hk, hv = hk[o], hv[o]
        new = np.ones(len(hk), dtype=bool)
        new[1:] = (hk[1:] != hk[:-1]) | (hv[1:] != hv[:-1])
        starts = np.flatnonzero(new)
        c = np.diff(np.append(starts, len(hk)))
        return pa.table({key_col: pa.array(hk[starts], type=pa.string()),
                         col: pa.array(hv[starts], type=pa.string()),
                         "_c": pa.array(c.astype(np.int64))})

    summed = narrow.map_batches(count_cand, batch_format="pyarrow") \
        .groupby([key_col, col]).aggregate(Sum("_c", alias_name="_c"))

    def finish(batch: pa.Table) -> pa.Table:
        if "_c" not in batch.schema.names or batch.num_rows == 0:
            return pa.table({key_col: pa.array([], type=pa.string()),
                             col: pa.array([], type=pa.string()),
                             count_col: pa.array([], type=pa.int64())})
        mins = ray.get(min_ref)
        keys = batch[key_col].to_pylist()
        c = batch["_c"].to_numpy(zero_copy_only=False)
        keep = np.asarray([ci >= mins.get(kk, 1)
                           for kk, ci in zip(keys, c)])
        out = batch.filter(pa.array(keep))
        return pa.table({key_col: out[key_col].cast(pa.string()),
                         col: out[col].cast(pa.string()),
                         count_col: out["_c"].cast(pa.int64())})

    return summed.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-min sketch — the frequency sketch (Cormode & Muthukrishnan 2005,
# "An improved data stream summary: the count-min sketch"). Misra-Gries
# (above) answers "which keys are heavy"; count-min answers "how often is
# THIS key" for any key, in d x w counters, with one-sided error
# (estimate >= truth, overshoot <= eps * N w.h.p.).
# ---------------------------------------------------------------------------


def countmin_fold(values, d: int = 4, w: int = 1024,
                  seed: int = 0) -> np.ndarray:
    """Fold a string array into a (d, w) int64 count-min matrix: one
    vectorized hash + bincount pass per row of the sketch."""
    cm = np.zeros((d, w), dtype=np.int64)
    for r in range(d):
        h = (hash_str_u64(values, seed=seed + r) % np.uint64(w)) \
            .astype(np.int64)
        cm[r] += np.bincount(h, minlength=w)
    return cm


def countmin_query(cm: np.ndarray, keys, d: int = 4, w: int = 1024,
                   seed: int = 0) -> np.ndarray:
    """Point-estimate counts for `keys`: min over the d counter rows."""
    keys = pa.array(np.asarray(keys, dtype=str)) \
        if not isinstance(keys, pa.Array) else keys
    est = None
    for r in range(d):
        h = (hash_str_u64(keys, seed=seed + r) % np.uint64(w)) \
            .astype(np.int64)
        v = cm[r, h]
        est = v if est is None else np.minimum(est, v)
    return est


def countmin_build(ds, col: str, d: int = 4, w: int = 1024, seed: int = 0,
                   merge_buckets: int = 32) -> np.ndarray:
    """Distributed count-min over a Dataset column. Map-side (d, w)
    partial per block — counter addition is lossless, so the fold is
    exact for the sketch — then a bucketed intermediate sum-merge: the
    driver sees at most merge_buckets x d x w x 8 bytes at any block
    count (the hll_distinct two-level shape)."""
    def fold(batch: pa.Table) -> pa.Table:
        cm = countmin_fold(batch[col].cast(pa.string()), d=d, w=w,
                           seed=seed)
        b = int(cm.sum()) % merge_buckets
        return pa.table({"cm": pa.array([cm.tobytes()], type=pa.binary()),
                         "_b": pa.array([b], type=pa.int32())})

    def merge_group(g: pa.Table) -> pa.Table:
        acc = np.zeros(d * w, dtype=np.int64)
        for rb in g["cm"].to_pylist():
            acc += np.frombuffer(rb, dtype=np.int64)
        return pa.table({"cm": pa.array([acc.tobytes()],
                                        type=pa.binary())})

    parts = ds.map_batches(fold, batch_format="pyarrow") \
        .groupby("_b").map_groups(merge_group, batch_format="pyarrow") \
        .take_all()
    merged = np.zeros(d * w, dtype=np.int64)
    for r in parts:
        merged += np.frombuffer(r["cm"], dtype=np.int64)
    return merged.reshape(d, w)


# ---------------------------------------------------------------------------
# KMV / theta sketch — the DISTINCT-SET-OPERATIONS sketch (Bar-Yossef et
# al. 2002 "Counting distinct elements in a data stream"; the theta-sketch
# framework of Dasgupta et al. 2016). HLL (above) answers "how many
# distinct in ONE set"; KMV keeps the k smallest distinct hash values, so
# sketches of different sets COMPOSE: union = k smallest of the merged
# hash sets, intersection = matching hashes below the common threshold.
# That answers "how many distinct users did segments A and B share"
# without ever shuffling the raw value sets against each other.
#
# Exactness property used by the oracle: while a set's distinct count is
# <= k the sketch holds EVERY distinct hash (theta = 1), so union /
# intersection counts are exact — the countmin_build "exact at ample
# width" pattern. Below-k error is the published (k-1)/theta estimator,
# pinned by pytest bounds.
# ---------------------------------------------------------------------------


def kmv_fold(values, k: int, seed: int = 0) -> np.ndarray:
    """Fold a string array into its KMV sketch: the sorted k smallest
    DISTINCT 64-bit hashes (uint64, length <= k). One vectorized hash +
    unique pass; np.unique already sorts."""
    h = np.unique(hash_str_u64(values, seed=seed))
    return h[:k]


def kmv_merge(sketches, k: int) -> np.ndarray:
    """Merge partial sketches: k smallest of the distinct union."""
    return np.unique(np.concatenate(list(sketches)))[:k]


def kmv_theta(sk: np.ndarray, k: int) -> float:
    """Inclusion threshold in [0, 1]: 1.0 while the sketch is exact
    (holds < k hashes), else the k-th smallest normalized hash."""
    if len(sk) < k:
        return 1.0
    return float(sk[k - 1]) / 2.0 ** 64


def kmv_distinct(sk: np.ndarray, k: int) -> float:
    """Distinct-count estimate: exact size below k, else (k-1)/theta."""
    if len(sk) < k:
        return float(len(sk))
    return (k - 1) / kmv_theta(sk, k)


def kmv_pair_ops(sk_a: np.ndarray, sk_b: np.ndarray, k: int):
    """(union_est, intersection_est) for two KMV sketches: cut both at
    theta = min(theta_a, theta_b), then |union-cut| / theta and
    |matching hashes| / theta (the standard theta-sketch set-op
    estimators; exact when both sketches are exact)."""
    theta = min(kmv_theta(sk_a, k), kmv_theta(sk_b, k))
    lim = np.uint64(int(theta * 2.0 ** 64)) if theta < 1.0 else None
    a = sk_a if lim is None else sk_a[sk_a < lim]
    b = sk_b if lim is None else sk_b[sk_b < lim]
    union = len(np.union1d(a, b))
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return union / theta, inter / theta


def kmv_set_ops_per_key(ds, key_col: str, col: str, k: int = 1 << 14,
                        seed: int = 0) -> pa.Table:
    """Pairwise distinct-set operations between the per-key value sets
    of a Dataset: for every key pair (key_a < key_b) estimate
    |values(a) UNION values(b)| and |values(a) INTERSECT values(b)|.

    Distributed shape (the hll_distinct_per_key two-level fold): each
    batch emits one (key, partial-sketch) row per batch-distinct key —
    constant <= k*8 bytes per (block, key) — sketches merge losslessly
    inside groupby(key).map_groups, and only the S final sketches (S =
    number of segments, small by construction) reach the driver for the
    S^2/2 pairwise estimates. The raw value sets never shuffle against
    each other — that is the point of the sketch.

    Returns an Arrow table (key_a, key_b, union_distinct:int64,
    inter_distinct:int64) with estimates rounded to integers (exact
    whenever every per-key distinct count is <= k)."""
    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: pa.array([], type=pa.string()),
                             "sk": pa.array([], type=pa.binary())})
        keys = np.asarray(batch[key_col].cast(pa.string())
                          .to_pylist())
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        vals = batch[col].cast(pa.string()).take(
            pa.array(order, type=pa.int64()))
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]]))
        ends = np.concatenate([starts[1:], [len(ks)]])
        out_k, out_s = [], []
        for s, e in zip(starts, ends):
            out_k.append(ks[s])
            out_s.append(kmv_fold(vals.slice(s, e - s), k=k,
                                  seed=seed).tobytes())
        return pa.table({key_col: pa.array(out_k, type=pa.string()),
                         "sk": pa.array(out_s, type=pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], type=pa.string()),
                             "sk": pa.array([], type=pa.binary())})
        merged = kmv_merge(
            [np.frombuffer(rb, dtype=np.uint64)
             for rb in g["sk"].to_pylist()], k=k)
        return pa.table({key_col: pa.array([g[key_col][0].as_py()],
                                           type=pa.string()),
                         "sk": pa.array([merged.tobytes()],
                                        type=pa.binary())})

    finals = ds.select_columns([key_col, col]) \
        .map_batches(fold, batch_format="pyarrow") \
        .groupby(key_col).map_groups(merge, batch_format="pyarrow") \
        .take_all()
    finals.sort(key=lambda r: r[key_col])
    names = [r[key_col] for r in finals]
    sks = [np.frombuffer(r["sk"], dtype=np.uint64) for r in finals]
    ka, kb, un, it = [], [], [], []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            u, x = kmv_pair_ops(sks[i], sks[j], k=k)
            ka.append(names[i])
            kb.append(names[j])
            un.append(int(round(u)))
            it.append(int(round(x)))
    return pa.table({"key_a": pa.array(ka, type=pa.string()),
                     "key_b": pa.array(kb, type=pa.string()),
                     "union_distinct": pa.array(un, type=pa.int64()),
                     "inter_distinct": pa.array(it, type=pa.int64())})
