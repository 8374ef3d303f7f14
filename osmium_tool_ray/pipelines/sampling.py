"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be (a) a single streaming pass, (b) reproducible
across runs/retries/partitionings, and (c) oracle-checkable. All three
rule out RNG state: every operator here derives its randomness from a
fixed multiplicative hash of a row id (Knuth's 2654435761 multiplier),
so the sample is a pure function of the data — the same rows come back
no matter how blocks are split, retried, or reordered, and the exact
same predicate is expressible in SQL for the DuckDB oracle.

The reference has no sampling surface (closest is `getid` with an
explicit id list); these are graft additions per the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

KNUTH = 2654435761
MOD = np.int64(1) << np.int64(31)


def det_hash(ids: np.ndarray, mult: int = KNUTH, mod: int = int(MOD)) -> np.ndarray:
    """(id * mult) mod m over int64 — overflow-free for |id| < 2^63/mult,
    and writable verbatim in ANSI SQL for the oracle."""
    return (ids.astype(np.int64) * np.int64(mult)) % np.int64(mod)


def uniform_sample(ds, id_col: str, frac: float, seed_mult: int = KNUTH):
    """Deterministic Bernoulli sample: keep rows with hash < frac * m.
    Pure map-side filter — no shuffle, no state, retry-stable."""
    thresh = np.int64(int(frac * int(MOD)))

    def f(batch: pa.Table) -> pa.Table:
        h = det_hash(batch[id_col].to_numpy(zero_copy_only=False),
                     mult=seed_mult)
        return batch.filter(pa.array(h < thresh))

    return ds.map_batches(f, batch_format="pyarrow")


def hash_split(ds, id_col: str, weights: tuple[float, ...],
               seed_mult: int = KNUTH):
    """Deterministic train/val/test split: row -> bucket by hash range in
    proportion to `weights`. Returns one lazily-filtered Dataset per
    weight; the union of the splits is exactly the input and the splits
    are disjoint (hash ranges partition [0, m))."""
    w = np.asarray(weights, dtype=np.float64)
    edges = np.concatenate([[0.0], np.cumsum(w) / w.sum()]) * int(MOD)
    edges = edges.astype(np.int64)
    edges[-1] = int(MOD)            # close the last range despite rounding

    def cut(lo: int, hi: int):
        def f(batch: pa.Table) -> pa.Table:
            h = det_hash(batch[id_col].to_numpy(zero_copy_only=False),
                         mult=seed_mult)
            return batch.filter(pa.array((h >= lo) & (h < hi)))
        return f

    return [ds.map_batches(cut(int(lo), int(hi)), batch_format="pyarrow")
            for lo, hi in zip(edges[:-1], edges[1:])]


def weighted_sample(ds, id_col: str, weight_col: str, weight_cap: int,
                    seed_mult: int = KNUTH):
    """Deterministic WEIGHTED Bernoulli sample: row i kept with
    probability min(w_i, cap) / cap. The inclusion test is pure int64
    arithmetic — hash(id) * cap < min(w, cap) * m — so there is no
    floating-point boundary to disagree across engines, partitionings or
    retries, and the identical predicate runs in the DuckDB oracle.
    (Training-data use: length-proportional document sampling, so short
    boilerplate is down-weighted without a shuffle or a second pass.)

    Overflow-safe for hash < 2^31 and cap * m < 2^63 (cap <= ~4e9)."""
    cap = np.int64(weight_cap)

    def f(batch: pa.Table) -> pa.Table:
        h = det_hash(batch[id_col].to_numpy(zero_copy_only=False),
                     mult=seed_mult)
        w = batch[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = h * cap < np.minimum(w, cap) * np.int64(MOD)
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, key_cols: list[str], id_col: str, n_per_key: int,
                      seed_mult: int = KNUTH):
    """Exactly n rows per stratum (fewer when the stratum is smaller),
    chosen as the n smallest (hash, id) pairs per key — the
    row_number() OVER (PARTITION BY key ORDER BY hash, id) <= n window.

    Same partial+final shape as topk_per_key (pipelines/merge.py:71):
    each block prunes to <= n candidates per key map-side, so the
    shuffle carries n x keys x blocks rows at most, then the finisher
    repeats the multi-key prune once per hash(keys)%buckets bucket
    (group_by_key_bucket — per-partition Python, not per key).
    Deterministic: the winning ids are a pure function of the data."""
    key_cols = list(key_cols)

    def with_hash(batch: pa.Table) -> pa.Table:
        h = det_hash(batch[id_col].to_numpy(zero_copy_only=False),
                     mult=seed_mult)
        return batch.append_column("_hsh", pa.array(h))

    cols = key_cols + ["_hsh", id_col]

    def local(df: pd.DataFrame) -> pa.Table:
        out = df if df.empty else \
            df.sort_values(cols, ascending=True, kind="stable") \
              .groupby(key_cols, sort=False).head(n_per_key)
        # metadata-free Arrow out: a pandas-block schema feeding the
        # groupby shuffle defeats Ray's schema-dedup hash (merge.py
        # argmax_rows has the same guard)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    from ..blocks import group_by_key_bucket

    tagged = ds.map_batches(with_hash, batch_format="pyarrow")
    pruned = tagged.map_batches(local, batch_format="pandas")
    final = group_by_key_bucket(pruned, key_cols, local,
                                batch_format="pandas")
    return final.drop_columns(["_hsh"])


def fixed_k_sample(ds, id_col: str, k: int, seed_mult: int = KNUTH):
    """Deterministic EXACT-k uniform sample — the reservoir-sampling use
    case without reservoir state: order all rows by (det_hash(id), id)
    and keep the first k. Because the hash is a pure function of the id,
    the winning set is a property of the DATA (retry/partitioning
    stable) and the oracle is `ORDER BY (id*KNUTH)%m, id LIMIT k`.

    Scale shape: each batch first prunes map-side to its k smallest
    (hash, id) rows, so the distributed sort + limit runs over at most
    k rows per input block instead of the full table — no driver
    materialization, no RNG, one tiny sort."""
    def prune(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = det_hash(ids, mult=seed_mult)
        if batch.num_rows > k:
            sel = np.lexsort((ids, h))[:k]
            batch = batch.take(pa.array(np.sort(sel)))
            h = h[np.sort(sel)]
        return batch.append_column("_h", pa.array(h))

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.sort(["_h", id_col]).limit(k).drop_columns(["_h"])


def keyed_rate_sample(ds, id_col: str, key_col: str, rates: dict[str, float],
                      default_rate: float = 0.0, seed_mult: int = KNUTH):
    """Source-weighted dataset mixing — keep each row with its KEY's
    rate (e.g. {"web": 0.3, "books": 1.0}): the data-mixing /
    temperature-sampling step that rebalances sources before training.
    Same determinism contract as uniform_sample (pure function of the
    id, retry/partition stable, SQL-expressible via CASE); the rate map
    is a tiny driver-side dict baked into the closure — no shuffle, one
    streaming pass."""
    keys = np.asarray(sorted(rates), dtype=str)
    thresh = np.asarray([int(rates[k] * int(MOD)) for k in keys],
                        dtype=np.int64)
    dflt = np.int64(int(default_rate * int(MOD)))

    def f(batch: pa.Table) -> pa.Table:
        h = det_hash(batch[id_col].to_numpy(zero_copy_only=False),
                     mult=seed_mult)
        kv = np.asarray(batch[key_col].to_pylist(), dtype=str)
        pos = np.searchsorted(keys, kv)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == kv)
        t = np.where(hit, thresh[np.minimum(pos, len(keys) - 1)], dflt)
        return batch.filter(pa.array(h < t))

    return ds.map_batches(f, batch_format="pyarrow")


def leakage_safe_split(docs, text_col: str = "text",
                       id_col: str = "doc_id",
                       val_pct: int = 10, test_pct: int = 10):
    """Leakage-safe train/val/test split: the split key is the
    CONTENT-GROUP REPRESENTATIVE (min id among exact-content
    duplicates), not the row id — so duplicated documents can never
    straddle splits and leak eval data into training (the dedup-aware
    split discipline of modern LM data work; a naive id-hash split
    leaks every duplicate pair).

    ONE narrow (id, fp) shuffle assigns representatives (64-bit content
    fingerprint stands in for text equality at ~2^-64 collision risk,
    exactly like dedup_exact_docs); the split rule is deterministic
    arithmetic on the representative (rep % 100), so the assignment is
    reproducible at any partitioning and in SQL.

    Returns (id_col, split:string, rep:int64)."""
    from ..stages.text import Fingerprint

    fp_fn = Fingerprint(text_col=text_col)

    def tag(batch: pa.Table) -> pa.Table:
        return fp_fn(batch).select([id_col, "fp"])

    def pick(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "split": pa.array([], type=pa.string()),
                          "rep": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "fp" not in g.schema.names:
            return empty
        ids = g[id_col].to_numpy(zero_copy_only=False)
        fp = g["fp"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, fp))
        f, i = fp[order], ids[order]
        first = np.ones(len(f), dtype=bool)
        first[1:] = f[1:] != f[:-1]
        head = np.maximum.accumulate(
            np.where(first, np.arange(len(f)), 0))
        rep = i[head]
        b = rep % 100
        split = np.where(b < test_pct, "test",
                         np.where(b < test_pct + val_pct, "val",
                                  "train"))
        return pa.table({id_col: g[id_col].take(pa.array(order)),
                         "split": pa.array(split, type=pa.string()),
                         "rep": pa.array(rep.astype(np.int64))})

    # bucket by fp so every content group lands in one fold group
    from ..functions.hashing import splitmix64

    import ray
    buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    def bucket(batch: pa.Table) -> pa.Table:
        b = (splitmix64(batch["fp"].to_numpy(zero_copy_only=False)
                        .view(np.uint64)) % np.uint64(buckets)) \
            .astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    return docs.map_batches(tag, batch_format="pyarrow") \
        .map_batches(bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(pick, batch_format="pyarrow")


def leakage_safe_split_neardup(docs, text_col: str = "text",
                               id_col: str = "doc_id",
                               val_pct: int = 10, test_pct: int = 10,
                               threshold: float = 0.7,
                               attach_mode: str = "auto",
                               broadcast_cap: int = 2_000_000,
                               buckets: int | None = None):
    """NEAR-dup-aware train/val/test split: the split key is the MinHash
    cluster representative (smallest id of the near-duplicate cluster,
    stages/dedup.minhash_dedup), so paraphrased/boilerplate variants of
    one document can never straddle splits — the decontamination
    discipline eval suites actually need (exact-hash splitting, above,
    misses every near-dup pair).

    Representative attach (identical results, pinned by pytest):
      * "broadcast": the dup table rides ray.put as two sorted arrays;
        one streaming searchsorted pass. Right while the VERIFIED pair
        table fits worker RAM.
      * "bucketed": the dup table stays a DATASET; docs and pairs
        hash-bucket on the id and the rep lookup runs per bucket — web
        corpora dedup at 20-50%, so the pair table IS corpus-scale and
        must never be driver/worker-resident in full.
      * "auto" (default): bucketed past `broadcast_cap` pairs.

    Returns (id_col, split, rep)."""
    import ray

    from ..stages.dedup import minhash_dedup

    pairs = minhash_dedup(docs, text_col=text_col, id_col=id_col,
                          threshold=threshold)
    if attach_mode == "auto":
        attach_mode = "broadcast" if pairs.num_rows <= broadcast_cap \
            else "bucketed"

    if attach_mode == "bucketed":
        return _neardup_split_bucketed(docs, pairs, id_col, val_pct,
                                       test_pct, buckets)

    dup_ids = np.asarray(pairs[id_col].to_pylist(), dtype=np.int64)
    dup_rep = np.asarray(pairs["dup_of"].to_pylist(), dtype=np.int64)
    order = np.argsort(dup_ids)
    ref = ray.put((dup_ids[order], dup_rep[order]))

    def assign(batch: pa.Table) -> pa.Table:
        di, dr = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        rep = ids.copy()
        if len(di):
            pos = np.searchsorted(di, ids)
            hit = (pos < len(di)) & (di[np.minimum(pos, len(di) - 1)]
                                     == ids)
            rep[hit] = dr[np.minimum(pos, len(di) - 1)][hit]
        b = rep % 100
        split = np.where(b < test_pct, "test",
                         np.where(b < test_pct + val_pct, "val",
                                  "train"))
        return pa.table({id_col: batch[id_col],
                         "split": pa.array(split, type=pa.string()),
                         "rep": pa.array(rep.astype(np.int64))})

    return docs.select_columns([id_col]) \
        .map_batches(assign, batch_format="pyarrow")


def _neardup_split_bucketed(docs, pairs, id_col: str, val_pct: int,
                            test_pct: int, buckets: int | None):
    """The scale path of leakage_safe_split_neardup: the (id, dup_of)
    table joins the doc ids through ONE hash(id)%buckets shuffle (the
    semi_join_bucketed shape with a carried payload) — neither side is
    ever driver- or worker-resident in full. `pairs` may be a pa.Table
    (minhash_dedup's return) or a Dataset."""
    import ray
    import ray.data as rd

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    pairs_ds = rd.from_arrow(pairs) if isinstance(pairs, pa.Table) \
        else pairs

    def tag(is_pair: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].cast(pa.int64())
            iv = ids.to_numpy(zero_copy_only=False)
            dup = batch["dup_of"].cast(pa.int64()) if is_pair \
                else pa.nulls(batch.num_rows, type=pa.int64())
            return pa.table({
                id_col: ids, "dup_of": dup,
                "_side": pa.array(np.full(batch.num_rows,
                                          1 if is_pair else 0,
                                          dtype=np.int8)),
                "_b": pa.array((iv.view(np.uint64) % np.uint64(buckets))
                               .astype(np.int32))})
        return f

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "split": pa.array([], type=pa.string()),
                          "rep": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or id_col not in g.schema.names:
            return empty
        side = g["_side"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        is_pair = side == 1
        rep = ids[~is_pair].copy()
        if is_pair.any():
            pid = ids[is_pair]
            pdup = g["dup_of"].to_numpy(zero_copy_only=False)[is_pair] \
                .astype(np.int64)
            o = np.argsort(pid)
            pid, pdup = pid[o], pdup[o]
            pos = np.searchsorted(pid, rep)
            hit = (pos < len(pid)) & \
                (pid[np.minimum(pos, len(pid) - 1)] == rep)
            rep[hit] = pdup[np.minimum(pos, len(pid) - 1)][hit]
        b = rep % 100
        split = np.where(b < test_pct, "test",
                         np.where(b < test_pct + val_pct, "val",
                                  "train"))
        return pa.table({id_col: pa.array(ids[~is_pair]),
                         "split": pa.array(split, type=pa.string()),
                         "rep": pa.array(rep.astype(np.int64))})

    doc_ids = docs.select_columns([id_col]) \
        .map_batches(tag(False), batch_format="pyarrow")
    pair_rows = pairs_ds.map_batches(tag(True), batch_format="pyarrow")
    return doc_ids.union(pair_rows).groupby("_b").map_groups(
        fold, batch_format="pyarrow")


def per_key_sample(ds, id_col: str, key_col: str, k: int,
                   seed_mult: int = KNUTH):
    """Deterministic EXACT-k-per-key sample — fixed_k_sample's grouped
    twin (stratified_sample picks rates; this picks exactly k winners
    per key by hash order, the per-source eval-holdout staple). Oracle:
    ROW_NUMBER() OVER (PARTITION BY key ORDER BY (id*KNUTH)%m, id) <= k.

    Scale shape: each batch prunes map-side to its k smallest
    (hash, id) rows PER KEY (one lexsort + run-length cumcount — no
    per-key Python), so the finisher — the same multi-key prune run
    once per hash(key)%buckets bucket (group_by_key_bucket) — sees at
    most k rows per key per input block. Hot keys cost k x blocks rows,
    not their full cardinality."""
    def _prune_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if "_h" in batch.schema.names:
            h = batch["_h"].to_numpy(zero_copy_only=False)
        else:
            h = det_hash(ids, mult=seed_mult)
            batch = batch.append_column("_h", pa.array(h))
        keys = np.asarray(batch[key_col].to_pylist(), dtype=str)
        order = np.lexsort((ids, h, keys))
        ks = keys[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        # rank within key run = position - run start
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(ks)))
        rank = np.arange(len(ks)) - np.repeat(starts, lens)
        sel = order[rank < k]
        return batch.take(pa.array(np.sort(sel)))

    from ..blocks import group_by_key_bucket

    pruned = ds.map_batches(_prune_topk, batch_format="pyarrow")
    return group_by_key_bucket(pruned, key_col, _prune_topk) \
        .drop_columns(["_h"])
