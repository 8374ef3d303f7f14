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

from ..functions.hashing import (hash64, hash_str_u64, splitmix64,
                                 splitmix64_into)

_U64 = np.uint64


def _flat_shingle_hashes(texts: list[str], k: int = 5):
    """All docs' char-k-shingle hashes in ONE flat uint64 array + per-doc
    segment offsets — a single rolling-window pass over the concatenated
    byte buffer (no per-doc Python loop). Cross-document windows are
    dropped via offset arithmetic; a doc shorter than k gets ONE shingle:
    the hash of its full text (a shared constant sentinel would make every
    pair of short docs Jaccard-1.0 false duplicates)."""
    bufs = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.asarray([len(b) for b in bufs], dtype=np.int64)
    buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    short = lens < k
    full_hash = hash_str_u64(texts) if short.any() else None
    if len(buf) < k:
        flat = (full_hash if full_hash is not None
                else np.zeros(len(texts), dtype=np.uint64)).copy()
        offs = np.arange(len(texts) + 1, dtype=np.int64)
        return flat, offs
    # polynomial hash sum(buf[i+j] * 257^j) via descending Horner — k
    # vectorized passes over ONE reused uint64 buffer. The former
    # (nwin, k) uint64 window matrix (astype of a sliding_window_view)
    # was ~100 MB of fresh allocation per 10k-doc batch; at worker
    # concurrency the mmap churn anti-scaled the whole band map.
    nwin = len(buf) - k + 1
    h = np.zeros(nwin, dtype=np.uint64)
    t = np.empty(nwin, dtype=np.uint64)
    c257 = _U64(257)
    with np.errstate(over="ignore"):
        for j in range(k - 1, -1, -1):
            np.multiply(h, c257, out=h)
            np.add(h, buf[j:j + nwin], out=h, casting="unsafe")
        splitmix64_into(h, h, t)
    doc_starts = np.concatenate([[0], np.cumsum(lens)])
    counts = np.maximum(lens - k + 1, 1)
    offs = np.concatenate([[0], np.cumsum(counts)])
    flat = np.empty(offs[-1], dtype=np.uint64)
    for i in range(len(texts)):  # cheap per-doc slice copy (memcpy, no hashing)
        if lens[i] < k:
            flat[offs[i]] = full_hash[i]
        else:
            flat[offs[i]:offs[i + 1]] = h[doc_starts[i]:doc_starts[i] + counts[i]]
    return flat, offs


def _shingle_hashes(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """Per-doc unique shingle-hash sets (used by the exact Jaccard verify)."""
    flat, offs = _flat_shingle_hashes(texts, k)
    return [np.unique(flat[offs[i]:offs[i + 1]]) for i in range(len(texts))]


def _sigs_from_flat(flat: np.ndarray, offs: np.ndarray, num_perm: int,
                    seed: int) -> np.ndarray:
    """(n_docs, num_perm) MinHash signatures from a flat token-hash
    buffer + per-doc offsets. Permutations are the universal-hash family
    h_i(x) = splitmix64(x ^ salt_i); per-doc minima via segmented
    minimum.reduceat — fully vectorized across the batch. Two reused
    scratch buffers across all permutations: 64 fresh (xor + splitmix)
    temporaries per batch were ~3 GB of allocation churn per task,
    anti-scaling the band map at worker concurrency."""
    salts = hash64(np.arange(num_perm, dtype=np.uint64), seed=seed)
    n = len(offs) - 1
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    starts = offs[:-1]
    z = np.empty_like(flat)
    t = np.empty_like(flat)
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            np.bitwise_xor(flat, salts[p], out=z)
            splitmix64_into(z, z, t)
            sigs[:, p] = np.minimum.reduceat(z, starts)
    return sigs


def minhash_signature(texts: list[str], num_perm: int = 64, k: int = 5,
                      seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures over char-k-shingle
    hashes (see _sigs_from_flat for the permutation scheme)."""
    flat, offs = _flat_shingle_hashes(texts, k)
    return _sigs_from_flat(flat, offs, num_perm, seed)


def _fold_sig64(sigs: np.ndarray) -> np.ndarray:
    """Fold an (n, p) uint64 signature matrix into one 64-bit sketch per
    row (sequential splitmix mixing). Equal full signatures -> equal
    sketch, so sorting a hot LSH bucket by this column makes
    (near-)identical members ADJACENT — the chain emission in
    _bucket_pairs then pairs them even when the bucket's min-id star hub
    is not a near-dup of either."""
    acc = sigs[:, 0].copy()
    with np.errstate(over="ignore"):
        for j in range(1, sigs.shape[1]):
            acc = splitmix64(acc ^ sigs[:, j])
    return acc.view(np.int64)


class MinHashBands:
    """map_batches stage: emit (doc_id, band_id, band_hash, sig64) rows —
    the LSH banding explode. groupby(band_id, band_hash) downstream
    buckets candidates; sig64 (full-signature sketch) orders hot buckets
    for chain emission."""

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
            "sig64": pa.array(np.repeat(_fold_sig64(sigs), self.bands)),
        })


def jaccard(a: str, b: str, k: int = 5) -> float:
    sa = _shingle_hashes([a], k)[0]
    sb = _shingle_hashes([b], k)[0]
    inter = np.intersect1d(sa, sb).size
    union = np.union1d(sa, sb).size
    return inter / union if union else 1.0


def _bucket_pairs(rows, bucket_keys: list[str], id_col: str, id_type,
                  all_pairs_cap: int = 8, coarse: int | None = None,
                  sig_col: str | None = None):
    """Distributed candidate-pair emission, vectorized: rows are shuffled
    by a COARSE hash of the bucket key (O(CPUs) groups, so map_groups pays
    Python overhead per partition, not per LSH bucket — millions of tiny
    buckets made the per-group form the slowest dedup stage), then each
    coarse group lexsorts its rows and emits (a, b) id pairs (a < b) per
    multi-member fine bucket — all pairs for buckets up to
    `all_pairs_cap` members; above the cap, star-shaped from the min-id
    hub PLUS (when `sig_col` names a full-signature sketch column) an
    adjacent chain in (sig, id) order, so a hot bucket stays linear,
    never quadratic. The chain is the recall guard the star alone lacks:
    two (near-)identical members whose hub is NOT their near-dup share a
    sketch value, sort adjacent, and get their pair emitted — the
    union-find downstream then connects the full identical run through
    its consecutive verified edges. Then a native distinct over (a, b).
    No bucket row ever reaches the driver.

    `id_type` pins the pair schema: Ray's map_groups emits zero-column
    blocks for group-less input blocks, and those would otherwise reach
    the downstream hash join as schema-less partitions (Acero then fails
    with 'no match for FieldRef(a)')."""
    import ray

    if coarse is None:
        coarse = max(8, int(ray.cluster_resources().get("CPU", 8)))
    schema = pa.schema([("a", id_type), ("b", id_type)])

    def add_coarse(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in bucket_keys:
                v = batch[k].to_numpy(zero_copy_only=False)
                h = splitmix64(h ^ v.astype(np.int64).view(np.uint64))
        return batch.append_column(
            "_cb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    def emit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return schema.empty_table()
        ids = np.asarray(g[id_col].to_pylist())
        sigs = g[sig_col].to_numpy(zero_copy_only=False) \
            if sig_col and sig_col in g.schema.names else None
        cols = [g[k].to_numpy(zero_copy_only=False) for k in bucket_keys]
        order = np.lexsort((ids,) + tuple(cols[::-1]))
        ids = ids[order]
        if sigs is not None:
            sigs = sigs[order]
        cols = [c[order] for c in cols]
        change = np.zeros(len(ids), dtype=bool)
        change[0] = True
        for c in cols:
            change[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(ids))
        outa: list = []
        outb: list = []
        for s, e in zip(starts, ends):   # multi-member fine buckets only
            if e - s < 2:
                continue
            uid = ids[s:e]
            dedup = np.concatenate([[True], uid[1:] != uid[:-1]])
            uid = uid[dedup]
            n = len(uid)
            if n < 2:
                continue
            if n <= all_pairs_cap:
                ai, bi = np.triu_indices(n, k=1)
                outa.append(uid[ai])
                outb.append(uid[bi])
            else:
                outa.append(np.repeat(uid[0], n - 1))
                outb.append(uid[1:])
                if sigs is not None:
                    # chain in full-signature-sketch order (see docstring);
                    # np.minimum has no ufunc loop for unicode ids — use
                    # comparison + where (works for str and int alike)
                    usig = sigs[s:e][dedup]
                    so = np.lexsort((uid, usig))
                    cu = uid[so]
                    le = cu[:-1] <= cu[1:]
                    outa.append(np.where(le, cu[:-1], cu[1:]))
                    outb.append(np.where(le, cu[1:], cu[:-1]))
        if not outa:
            return schema.empty_table()
        pa_, pb_ = np.concatenate(outa), np.concatenate(outb)
        # in-group distinct (same pair found via several bands routed to
        # this coarse group); cross-group duplicates — a pair colliding in
        # bands that hash to different coarse groups — survive to the
        # verify stage, which is idempotent, and the (tiny) verified-pair
        # union-find dedups them for free. That trade removes what was a
        # whole extra groupby shuffle just for global distinct.
        order = np.lexsort((pb_, pa_))
        pa_, pb_ = pa_[order], pb_[order]
        first = np.ones(len(pa_), dtype=bool)
        first[1:] = (pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1])
        return pa.table({"a": pa.array(pa_[first]),
                         "b": pa.array(pb_[first])}).cast(schema)

    def norm(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return schema.empty_table()
        return batch.select(["a", "b"]).cast(schema)

    # pin the tagged rows before the groupby: with a lazy expensive
    # upstream (shingle/minhash/decode maps), the streaming executor
    # throttles the map while the Sort barrier waits — measured 6.6/16
    # effective map parallelism fused vs ~13/16 pinned (2x chain wall).
    # `rows` is the narrow banded projection by contract, so the pin is
    # object-store cheap and spillable at scale.
    tagged = rows.map_batches(add_coarse,
                              batch_format="pyarrow").materialize()
    pairs = tagged.groupby("_cb").map_groups(emit, batch_format="pyarrow") \
        .map_batches(norm, batch_format="pyarrow")
    return _drop_empty_blocks(pairs)


# canonical home is osmium_tool_ray.blocks; re-exported here because the
# workaround was discovered in the dedup pipelines and older callers
# import it from this module
from ..blocks import _drop_empty_blocks, _remote_num_rows  # noqa: F401

# per-worker-process cache for the broadcast pair-payload lookup (stateless
# tasks fuse with upstream; the sorted payload is built once per worker)
_ATTACH_CACHE: dict = {}


def _attach_pair_payload(pairs, source, id_col: str, payload_col: str,
                         num_partitions: int | None = None,
                         broadcast_cap: int = 1_000_000,
                         consume=None, consume_indexed=None,
                         decode_payload=None):
    """pairs(a, b) -> pairs + (payload_a, payload_b) via two native
    hash-partitioned joins (Dataset.join) — the no-driver candidate
    gather.

    `consume` (optional, a pa.Table -> pa.Table verify function over the
    attached batch) is applied INSIDE the attach task on the broadcast
    path, so per-pair payload blobs never enter the object store: a
    star-shaped candidate list attaches ~KB of packed set per pair SIDE,
    and materializing that was a flat ~17 s object-store-bandwidth wall
    regardless of CPU count (measured 16.1 s at 4 CPUs / 18.3 s at 16 on
    4.3M candidate pairs). With the verify fused, only the narrow
    (a, b[, stats]) survivor rows leave the task. On the join fallback
    path it runs as a map right after the second join — same result,
    payloads ride the join shuffle (no broadcast state to fuse into).

    `consume_indexed` (optional, broadcast path only) goes one step
    further: called as `consume_indexed(sub, pos_a, pos_b, state)` where
    `sub` is the narrow matched (a, b) batch, pos_* index the worker's
    payload lookup, and `state = decode_payload(payload_column)` is
    decoded ONCE per worker and cached — the per-pair `pcol.take` +
    `to_pylist` blob materialization (measured ~100 us/pair of pure
    copy/Python-object churn, 432 s CPU on 4.3M pairs) never happens.
    When both are given, `consume` is the join-fallback-path form and
    `consume_indexed` the broadcast-path form of the SAME verify.

    num_partitions defaults to a fraction of the cluster CPUs: each join
    holds `num_partitions` aggregator actors alive for its lifetime, and
    two chained joins sized past the CPU count deadlock the actor pool
    (observed: 2x16 partitions on 4 CPUs never schedules). Callers on a
    real cluster pass an explicit value sized to data volume."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)
    # pairs fans out to TWO consumers here (the candidate-id fold below
    # and the attach/join), and an unmaterialized pair Dataset re-runs
    # its whole upstream lineage — including the pair-distinct shuffle —
    # once per consumer (measured 8 s of the 20 s minhash wall at 16
    # CPUs on 1M pairs). Pair tables are O(candidates), object-store
    # resident and spillable, so pinning them is the cheap side. Skip
    # the boundary when the caller already pinned (every executor
    # start/stop costs ~1 s of driver latency at ANY cpu count).
    from ray.data.dataset import MaterializedDataset
    if not isinstance(pairs, MaterializedDataset):
        pairs = pairs.materialize()
    payload = source.select_columns([id_col, payload_col])
    # filter the payload side down to candidate ids before the joins when
    # the candidate set is broadcastable — the joins then shuffle
    # O(candidates) payload rows instead of the whole corpus (above the
    # cap, fall back to the full hash join, which needs no driver state)
    # the fold stays in Arrow C++ (per-table pc.unique, re-uniqued into a
    # bounded accumulator) — the earlier Python set over to_pylist paid
    # seconds of driver time per million pairs; memory stays O(cap +
    # largest table) and the bail to the join path is unchanged
    import pyarrow.compute as pc

    acc = None
    over_cap = False
    for t in _pair_tables(pairs):
        u = pc.unique(pa.chunked_array(list(t["a"].chunks)
                                       + list(t["b"].chunks)))
        acc = u if acc is None else pc.unique(pa.chunked_array([acc, u]))
        if len(acc) > broadcast_cap:
            acc = None
            over_cap = True
            break
    if not over_cap:
        int_ids = acc is not None and pa.types.is_integer(acc.type)
        if acc is not None and len(acc):
            if int_ids:
                sorted_ids = np.sort(
                    acc.to_numpy(zero_copy_only=False).astype(np.int64))
            else:
                sorted_ids = np.sort(
                    np.asarray(acc.to_pylist()).astype(str))
        else:
            sorted_ids = np.empty(0, dtype=np.int64 if int_ids else str)
        cref = ray.put(sorted_ids)

        def _id_np(col):
            # batch ids -> searchsorted-comparable numpy, matching the
            # candidate array's dtype family (int64 ids never round-trip
            # through Python objects / U-strings)
            if int_ids:
                return col.to_numpy(zero_copy_only=False) \
                    .astype(np.int64, copy=False)
            return np.asarray(col.to_pylist()).astype(str)

        def keep_candidates(batch: pa.Table) -> pa.Table:
            ids = ray.get(cref)
            if len(ids) == 0 or batch.num_rows == 0:
                return batch.slice(0, 0)
            vals = _id_np(batch[id_col])
            pos = np.searchsorted(ids, vals)
            pos[pos == len(ids)] = len(ids) - 1
            return batch.filter(pa.array(ids[pos] == vals))

        payload = payload.map_batches(keep_candidates,
                                      batch_format="pyarrow").materialize()
        # candidate payload fits the broadcast cap: attach it map-side.
        # The lookup state (sorted id array + payload column in id order
        # + decoded flat payload) is built in ONE Ray task and shipped
        # through the object store; every attach worker ray.gets it
        # ZERO-COPY (numpy int64/U arrays and Arrow tables deserialize
        # as shared-memory views). Building it per worker instead
        # (concat + Python-object id cast + argsort + full payload take,
        # ~7 s each on a 400 MB payload) made the stage scale WITH
        # worker count — measured 19.5 s at 4 CPUs vs 58.7 s at 16 on
        # 4.3M pairs — because N workers redo the same build while
        # saturating memory bandwidth. Two hash joins cost ~2
        # aggregator-pool spinups; this is one task + one map.
        prefs = tuple(payload.to_arrow_refs())
        pschema = payload.schema()
        ptype = dict(zip(pschema.names, pschema.types))[payload_col]
        keep_pcol = consume_indexed is None or decode_payload is None
        want_decode = (consume_indexed is not None
                       and decode_payload is not None)

        def _build_state(*blocks):
            tbls = [t for t in blocks if t.num_rows]
            if not tbls:
                return (np.empty(0, dtype=np.int64 if int_ids else str),
                        None, None)
            tbl = pa.concat_tables(tbls)
            pids = _id_np(tbl[id_col])
            order = np.argsort(pids, kind="stable")
            pcol_sorted = tbl[payload_col].take(pa.array(order))
            if isinstance(pcol_sorted, pa.ChunkedArray):
                pcol_sorted = pcol_sorted.combine_chunks()
            decoded = decode_payload(pcol_sorted) if want_decode else None
            ptbl = pa.table({payload_col: pcol_sorted}) \
                if keep_pcol else None
            return pids[order], ptbl, decoded

        sref = ray.remote(num_cpus=1)(_build_state).remote(*prefs)

        def attach(batch: pa.Table) -> pa.Table:
            key = ("pair_payload", sref.hex())
            state = _ATTACH_CACHE.get(key)
            if state is None:
                state = ray.get(sref)
                _ATTACH_CACHE.clear()   # one live payload per worker
                _ATTACH_CACHE[key] = state
            pids, ptbl, decoded = state
            pcol = ptbl[payload_col] if ptbl is not None else None

            def gather(col):
                vals = _id_np(col)
                pos = np.searchsorted(pids, vals)
                if len(pids):
                    pos[pos == len(pids)] = len(pids) - 1
                    ok = pids[pos] == vals
                else:
                    ok = np.zeros(len(vals), dtype=bool)
                return pos, ok

            pos_a, ok_a = gather(batch["a"])
            pos_b, ok_b = gather(batch["b"])
            keep = ok_a & ok_b
            sub = batch.filter(pa.array(keep))
            if consume_indexed is not None:
                return consume_indexed(sub, pos_a[keep], pos_b[keep],
                                       decoded)
            if sub.num_rows == 0 or pcol is None:
                out = pa.table({
                    "a": sub["a"], "b": sub["b"],
                    f"{payload_col}_a": pa.array([], type=ptype),
                    f"{payload_col}_b": pa.array([], type=ptype),
                }) if sub.num_rows == 0 else sub
            else:
                out = pa.table({
                    "a": sub["a"], "b": sub["b"],
                    f"{payload_col}_a": pcol.take(pa.array(pos_a[keep])),
                    f"{payload_col}_b": pcol.take(pa.array(pos_b[keep])),
                })
            return consume(out) if consume is not None else out

        return pairs.map_batches(attach, batch_format="pyarrow")
    j = pairs.join(payload, join_type="inner", num_partitions=num_partitions,
                   on=("a",), right_on=(id_col,))
    j = j.select_columns(["a", "b", payload_col]) \
        .rename_columns({payload_col: f"{payload_col}_a"})
    j = j.join(payload, join_type="inner", num_partitions=num_partitions,
               on=("b",), right_on=(id_col,))
    j = j.select_columns(["a", "b", f"{payload_col}_a", payload_col]) \
        .rename_columns({payload_col: f"{payload_col}_b"})
    return j.map_batches(consume, batch_format="pyarrow") \
        if consume is not None else j


def _pair_set_inters(ids_a, ids_b, set_of, mask=None):
    """Exact set-intersection sizes for a batch of id pairs: each pair's
    smaller (sorted unique) token-hash set binary-searches the larger
    (ONE searchsorted + equality per pair, ~8 us) — measured 4.6x faster
    than the flat concat+lexsort formulation AND allocation-tiny, which
    matters under task concurrency: a flat per-batch array was hundreds
    of MB of lexsort temporaries per task, and N concurrent tasks
    mmap/munmap-ing that churned page-zeroing + TLB shootdowns into an
    8.7x per-task slowdown at 14 concurrent verifies.

    Returns (na, nb, inter) int64 arrays; pairs outside `mask` get
    inter=0 (their sizes are still filled)."""
    npairs = len(ids_a)
    na = np.empty(npairs, dtype=np.int64)
    nb = np.empty(npairs, dtype=np.int64)
    inter = np.zeros(npairs, dtype=np.int64)
    run_all = mask is None
    for i in range(npairs):
        sa = set_of[ids_a[i]]
        sb = set_of[ids_b[i]]
        na[i] = sa.size
        nb[i] = sb.size
        if not (run_all or mask[i]):
            continue
        if sa.size > sb.size:
            sa, sb = sb, sa
        if sb.size == 0:
            continue
        pos = np.searchsorted(sb, sa)
        pos[pos == sb.size] = sb.size - 1
        inter[i] = int(np.count_nonzero(sb[pos] == sa))
    return na, nb, inter


def _pair_set_inters_idx(pos_a, pos_b, state, mask=None,
                         chunk_elems: int = 2_000_000):
    """Positional exact set-intersection sizes for candidate pairs over
    the FLAT decoded payload `state = (vals, offs, sizes)` from
    `_decode_packed_u64`; pos_* index rows. Vectorized ACROSS pairs:
    each pair is oriented so its LARGER set is the search key, pairs
    are grouped by key (stable argsort — candidate lists are
    star-shaped, so keys repeat), the smaller sets' elements are
    gathered into one flat probe array via segmented index arithmetic,
    and ONE searchsorted per distinct key covers all its pairs. Python
    cost is per distinct key, not per pair (the per-pair searchsorted
    loop measured ~5 us/pair — 40+ s of CPU on 8M candidates); element
    traffic is sum(min(|sa|,|sb|)), the per-pair-optimal volume.
    Work proceeds in ~chunk_elems chunks over four PREALLOCATED
    buffers — fresh multi-100MB temporaries would re-create the
    mmap-churn anti-scaling this file keeps fighting. Pairs outside
    `mask` get 0."""
    vals, offs, sizes = state
    npairs = len(pos_a)
    inter = np.zeros(npairs, dtype=np.int64)
    if npairs == 0:
        return inter
    act = np.flatnonzero(mask) if mask is not None else np.arange(npairs)
    if len(act) == 0:
        return inter
    pa_ = np.asarray(pos_a)[act]
    pb_ = np.asarray(pos_b)[act]
    # group on the side with FEWER distinct rows (the hub side of a
    # star-shaped candidate list) — grouping is what amortizes the
    # per-key Python cost, so it must follow key repetition, not set
    # size (sampled estimate; correctness is side-independent)
    s_ = slice(0, min(len(pa_), 65_536))
    if len(np.unique(pa_[s_])) > len(np.unique(pb_[s_])):
        pa_, pb_ = pb_, pa_
    nz = (sizes[pa_] > 0) & (sizes[pb_] > 0)   # empty side -> inter 0
    big, small, act = pa_[nz], pb_[nz], act[nz]
    if len(act) == 0:
        return inter
    order = np.argsort(big, kind="stable")
    bigo, smallo, acto = big[order], small[order], act[order]
    cnt = sizes[smallo]
    ccs = np.cumsum(cnt)
    n_act = len(acto)
    cap = int(max(min(chunk_elems, ccs[-1]), cnt.max()))
    d = np.empty(cap, dtype=np.int64)      # index deltas -> flat_idx
    probe = np.empty(cap, dtype=vals.dtype)
    hit = np.empty(cap, dtype=bool)
    cs = np.empty(cap + 1, dtype=np.int64)
    start = 0
    while start < n_act:
        base = int(ccs[start - 1]) if start else 0
        stop = int(np.searchsorted(ccs, base + cap, side="right"))
        stop = min(max(stop, start + 1), n_act)
        bc, sc, cc = bigo[start:stop], smallo[start:stop], cnt[start:stop]
        tot = int(ccs[stop - 1] - base)
        segstart = np.zeros(len(cc), dtype=np.int64)
        np.cumsum(cc[:-1], out=segstart[1:])
        # flat gather indices via delta-cumsum (no np.repeat temporaries)
        dv = d[:tot]
        dv[:] = 1
        dv[0] = offs[sc[0]]
        if len(sc) > 1:
            dv[segstart[1:]] = offs[sc[1:]] - (offs[sc[:-1]] + cc[:-1]) + 1
        np.cumsum(dv, out=dv)
        np.take(vals, dv, out=probe[:tot])
        hv = hit[:tot]
        newk = np.ones(len(bc), dtype=bool)
        newk[1:] = bc[1:] != bc[:-1]
        kpos = np.flatnonzero(newk)
        kend = np.append(kpos[1:], len(bc))
        for s_, e_ in zip(kpos, kend):
            key = bc[s_]
            sb = vals[offs[key]:offs[key + 1]]
            lo = segstart[s_]
            hi = segstart[e_ - 1] + cc[e_ - 1]
            if sb.size == 0:
                hv[lo:hi] = False
                continue
            pr = probe[lo:hi]
            ps = np.searchsorted(sb, pr)
            ps[ps == sb.size] = sb.size - 1
            np.equal(sb[ps], pr, out=hv[lo:hi])
        csv = cs[:tot + 1]
        csv[0] = 0
        np.cumsum(hv, out=csv[1:])
        inter[acto[start:stop]] = csv[segstart + cc] - csv[segstart]
        start = stop
    return inter


def _decode_packed_u64(pcol):
    """Binary column of packed uint64 sets -> (flat uint64 value array,
    int64 ELEMENT offsets, int64 sizes). One pass over the Arrow
    buffers; no per-row Python bytes objects. Flat numpy (not a list of
    per-row views) so the whole state ships ZERO-COPY through the
    object store — the broadcast-attach build task decodes once and
    every verify worker ray.gets the same shared-memory arrays."""
    arr = pcol.combine_chunks() if isinstance(pcol, pa.ChunkedArray) \
        else pcol
    arr = arr.cast(pa.large_binary())
    n = len(arr)
    boffs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                          count=n + 1, offset=8 * arr.offset)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(boffs[-1]) if n else 0)
    vals = data.view(np.uint64)
    offs = (boffs // 8).astype(np.int64)
    sizes = offs[1:] - offs[:-1]
    return vals, offs, sizes


def minhash_dedup(docs, text_col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 64, bands: int = 16, k: int = 5,
                  threshold: float = 0.7, concurrency=None):
    """Full MinHash-LSH dedup: returns a pa.Table of (doc_id, dup_of) pairs
    where dup_of is the smallest doc id of the near-dup cluster.

    Every stage is distributed: band explode (map_batches), candidate-pair
    emission (groupby(band).map_groups — only the banded (id, band, hash)
    projection shuffles), candidate texts (broadcast block-ref lookup or
    hash-partitioned Dataset.joins past the cap), exact-Jaccard
    verification (vectorized map_batches). Only the VERIFIED pair table —
    proportional to the true dup rate, not the corpus — is collected for
    the min-label union-find.

    The banding stage holds only config (no model/index), so it runs as
    STATELESS TASKS (a closure over the tiny config object) that Ray
    fuses with the parquet read — an actor pool here would pay pool
    spin-up for no state benefit."""
    bander = MinHashBands(text_col=text_col, id_col=id_col,
                          num_perm=num_perm, bands=bands, k=k)
    return _text_lsh_clusters(docs, bander,
                              lambda texts: _shingle_hashes(texts, k),
                              text_col, id_col, threshold)


def _text_lsh_clusters(docs, bander, sets_fn, text_col: str, id_col: str,
                       threshold: float):
    """Shared tail of the text near-dup pipelines (MinHash char-shingle
    and word-n-gram): banding explode -> distributed candidate-pair
    emission (_bucket_pairs, sig64 chain for hot buckets) -> pair payload
    attach -> vectorized exact set-Jaccard verify -> min-label union-find
    over the (tiny) verified pairs. `sets_fn(texts)` builds the exact
    per-doc shingle-hash sets the verification compares."""
    band_rows = docs.map_batches(lambda b: bander(b), batch_format="pyarrow")

    s = docs.schema()
    id_type = dict(zip(s.names, s.types))[id_col]
    empty = pa.table({"doc_id": pa.array([], type=id_type),
                      "dup_of": pa.array([], type=id_type)})
    pairs = _bucket_pairs(band_rows, ["band_id", "band_hash"], id_col,
                          id_type, sig_col="sig64")
    if pairs is None:
        return empty

    # shingle each doc ONCE map-side and attach the PACKED uint64 sets
    # to the pairs instead of raw text: star-shaped candidate lists put
    # most docs in most verify batches, so a text attach makes every
    # verify task re-shingle nearly the whole corpus (measured 16 x
    # 3.5 s of redundant CPU on 20k docs at 16 tasks); a packed-set
    # attach is one frombuffer view per (task, doc). Binary packing is
    # the same idiom as set_jaccard_join's visited-cells payload.
    def pack_sets(batch: pa.Table) -> pa.Table:
        sets = sets_fn(batch[text_col].to_pylist())
        return pa.table({
            id_col: batch[id_col],
            "packed": pa.array([st.tobytes() for st in sets],
                               type=pa.binary())})

    packed = docs.map_batches(pack_sets, batch_format="pyarrow")

    def verify(batch: pa.Table) -> pa.Table:
        ids_a = batch["a"].to_pylist()
        ids_b = batch["b"].to_pylist()
        pka = batch["packed_a"].to_pylist()
        pkb = batch["packed_b"].to_pylist()
        set_of: dict = {}
        for i, buf in zip(ids_a, pka):
            if i not in set_of:
                set_of[i] = np.frombuffer(buf, dtype=np.uint64)
        for i, buf in zip(ids_b, pkb):
            if i not in set_of:
                set_of[i] = np.frombuffer(buf, dtype=np.uint64)
        # J <= min/max — skip the intersect where the size bound alone
        # already rules the pair out; the rest verify via the chunked
        # vectorized flat-lexsort intersection (_pair_set_inters)
        na0 = np.fromiter((set_of[i].size for i in ids_a), np.int64,
                          batch.num_rows)
        nb0 = np.fromiter((set_of[i].size for i in ids_b), np.int64,
                          batch.num_rows)
        mx = np.maximum(na0, nb0)
        bound_ok = (mx == 0) | (np.minimum(na0, nb0) >=
                                threshold * mx - 1e-9)
        na, nb, inter = _pair_set_inters(ids_a, ids_b, set_of,
                                         mask=bound_ok)
        union = na + nb - inter
        jacc = inter / np.maximum(union, 1)
        keep = bound_ok & ((union == 0) | (jacc >= threshold))
        return batch.select(["a", "b"]).filter(pa.array(keep))

    def verify_indexed(sub: pa.Table, pos_a, pos_b, state) -> pa.Table:
        # broadcast-path twin of `verify`: sizes come from the decoded
        # per-worker state, sets are zero-copy views — no blob take()
        if sub.num_rows == 0 or state is None:
            return sub
        sz = state[2]
        na0, nb0 = sz[pos_a], sz[pos_b]
        mx = np.maximum(na0, nb0)
        bound_ok = (mx == 0) | (np.minimum(na0, nb0) >=
                                threshold * mx - 1e-9)
        inter = _pair_set_inters_idx(pos_a, pos_b, state, mask=bound_ok)
        union = na0 + nb0 - inter
        jacc = inter / np.maximum(union, 1)
        keep = bound_ok & ((union == 0) | (jacc >= threshold))
        return sub.filter(pa.array(keep))

    survivors = _attach_pair_payload(pairs, packed, id_col, "packed",
                                     consume=verify,
                                     consume_indexed=verify_indexed,
                                     decode_payload=_decode_packed_u64)
    # per-block star contraction: the driver fixpoint ingests <=
    # #distinct-ids star edges per block, not the full verified-pair
    # volume (2.5M pairs -> ~150k edges on the bench twin)
    contracted = survivors.map_batches(_star_contract,
                                       batch_format="pyarrow",
                                       batch_size=None)
    out = _minlabel_union_tables(_pair_tables(contracted))
    if not out:
        return empty
    return pa.table({"doc_id": pa.array([o[0] for o in out]),
                     "dup_of": pa.array([o[1] for o in out])})


def _minlabel_union(verified: list) -> list:
    """Min-label union-find over a (small) verified-pair list: returns
    (member, cluster_root) rows, roots excluded — each doc maps to ONE
    canonical id, consistent across chains. Labels compare in their
    NATURAL order (int ids numerically — a string comparison would make
    9 > 59 and flip cluster roots), falling back to str for mixed
    types.

    Homogeneous id types take the vectorized path: dense-rank via
    np.unique, then scatter-min label propagation with pointer jumping
    to fixpoint — O(E) numpy work per round, O(log diameter) rounds
    (the dict walk cost ~2.4 s of driver time per 2.5M pairs; this is
    ~60 ms). Fixpoint labels ARE the component minima, identical to the
    union-by-min-root dict result. Mixed-type pairs (str + int ids)
    keep the dict loop."""
    if verified:
        a_vals = np.asarray([p[0] for p in verified])
        b_vals = np.asarray([p[1] for p in verified])
        if a_vals.dtype != object and b_vals.dtype != object:
            return _minlabel_union_np(a_vals, b_vals)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def le(x, y):
        try:
            return x <= y
        except TypeError:
            return str(x) <= str(y)

    try:
        ordered = sorted(verified)
    except TypeError:
        ordered = sorted(verified, key=lambda p: (str(p[0]), str(p[1])))
    for a, b in ordered:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if le(ra, rb) else (rb, ra)
            parent[hi] = lo
    try:
        members = sorted({i for p in verified for i in p})
    except TypeError:
        members = sorted({i for p in verified for i in p}, key=str)
    return [(x, find(x)) for x in members if find(x) != x]


def _pair_tables(ds) -> list[pa.Table]:
    """Materialize a (small) pair Dataset as Arrow tables, skipping the
    empty no-schema blocks Ray emits for group-less input blocks."""
    import ray

    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]


def _minlabel_union_tables(vtbls: list) -> list:
    """`_minlabel_union` straight off the verified-pair Arrow tables —
    int64 id columns reach the vectorized core via to_numpy (no Python
    tuple list; the list build alone cost ~2 s per 2.5M pairs), string
    ids via one U-dtype conversion."""
    if not vtbls:
        return []
    typ = vtbls[0].schema.field("a").type
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        cols = [(t["a"].to_numpy(zero_copy_only=False),
                 t["b"].to_numpy(zero_copy_only=False)) for t in vtbls]
        a = np.concatenate([c[0] for c in cols])
        b = np.concatenate([c[1] for c in cols])
    else:
        a = np.asarray([x for t in vtbls for x in t["a"].to_pylist()])
        b = np.asarray([x for t in vtbls for x in t["b"].to_pylist()])
        if a.dtype == object or b.dtype == object:   # mixed types
            return _minlabel_union(
                [(x, y) for x, y in zip(a.tolist(), b.tolist())])
    return _minlabel_union_np(a, b)


def _minlabel_core(a: np.ndarray, b: np.ndarray):
    """Vectorized min-label fixpoint (see _minlabel_union docstring):
    dense-rank, scatter-min label propagation, pointer jumping.
    Returns (uniq ids, fixpoint label indices into uniq)."""
    arr = np.concatenate([a, b])
    uniq, inv = np.unique(arr, return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    label = np.arange(len(uniq), dtype=np.int64)
    while True:
        before = label.copy()
        mn = np.minimum(label[ia], label[ib])
        np.minimum.at(label, ia, mn)
        np.minimum.at(label, ib, mn)
        while True:
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label, before):
            break
    return uniq, label


def _minlabel_union_np(a: np.ndarray, b: np.ndarray) -> list:
    """_minlabel_core + the (member, root) list build."""
    uniq, label = _minlabel_core(a, b)

    def _py(v):
        return v.item() if hasattr(v, "item") else v
    return [(_py(uniq[i]), _py(uniq[label[i]]))
            for i in np.flatnonzero(label != np.arange(len(uniq)))]


def _star_contract(batch: pa.Table) -> pa.Table:
    """Map-side component contraction ahead of the driver min-label
    union: run the vectorized union-find WITHIN the block and emit each
    block-local component as a star (member -> block-local root) —
    <= #distinct-ids rows instead of #pairs. A union of per-block
    spanning stars preserves GLOBAL components (ids shared between
    blocks bridge them), so the driver fixpoint ingests 10-20x fewer
    edges on dup-heavy candidate sets. Mixed-type id blocks pass
    through unchanged (they take the dict path driver-side)."""
    if batch.num_rows == 0 or "a" not in batch.schema.names:
        return batch
    typ = batch.schema.field("a").type
    numeric = pa.types.is_integer(typ) or pa.types.is_floating(typ)
    if numeric:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
    else:
        a = np.asarray(batch["a"].to_pylist())
        b = np.asarray(batch["b"].to_pylist())
        if a.dtype == object or b.dtype == object:
            return batch.select(["a", "b"])
    uniq, label = _minlabel_core(a, b)
    nz = np.flatnonzero(label != np.arange(len(uniq)))
    mem, root = uniq[nz], uniq[label[nz]]
    if numeric:
        return pa.table({"a": pa.array(mem).cast(typ),
                         "b": pa.array(root).cast(typ)})
    return pa.table({"a": pa.array(mem.tolist(), type=typ),
                     "b": pa.array(root.tolist(), type=typ)})


class SimHash:
    """map_batches stage: 64-bit SimHash of the token multiset. Fully
    vectorized: tokenization via the Arrow regex-split kernel, one
    hash_str_u64 call over every token of the batch, per-doc bit votes via
    64 weighted bincounts — no per-row Python loop."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        n = len(batch)
        arr = pc.utf8_lower(pa.array(batch[self.text_col].astype(str),
                                     type=pa.string()))
        toks = pc.split_pattern_regex(arr, pattern="[^a-z0-9_]+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n), counts)
        valid = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        out = np.zeros(n, dtype=np.uint64)
        if valid.any():
            hs = hash_str_u64(flat)[valid]
            di = doc_idx[valid]
            total = np.bincount(di, minlength=n)
            for j in range(64):
                ones = np.bincount(di, weights=((hs >> np.uint64(j))
                                                & np.uint64(1)).astype(np.float64),
                                   minlength=n)
                vote = 2 * ones - total
                out |= (vote > 0).astype(np.uint64) << np.uint64(j)
        batch[self.out_col] = out.view(np.int64)
        return batch


def _flat_word_ngram_hashes(texts: list[str], n: int = 3):
    """All docs' word-n-gram hashes in one flat uint64 array + per-doc
    offsets (the token-level analogue of _flat_shingle_hashes): tokenize
    every doc in one Arrow regex-split call, hash all tokens at once,
    then roll a window of n consecutive token hashes per doc via offset
    arithmetic. Docs with fewer than n tokens get one sentinel hash 0."""
    import pyarrow.compute as pc

    arr = pc.utf8_lower(pa.array(texts, type=pa.string()))
    toks = pc.split_pattern_regex(arr, pattern="[^a-z0-9_]+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat_tok = toks.flatten()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = pc.utf8_length(flat_tok).to_numpy(zero_copy_only=False) > 0
    doc_idx = np.repeat(np.arange(len(texts)), counts)[valid]
    th = hash_str_u64(flat_tok)[valid]
    vcounts = np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)
    # windowed combine of n consecutive token hashes; position enters
    # asymmetrically (acc mixed before xor) so reversed windows hash
    # differently — a plain xor-fold is symmetric for n=2
    if len(th) >= n:
        win = np.lib.stride_tricks.sliding_window_view(th, n)
        acc = win[:, 0].copy()
        z = np.empty_like(acc)
        t = np.empty_like(acc)
        with np.errstate(over="ignore"):
            for j in range(1, n):
                # acc = splitmix64(splitmix64(acc) ^ win[:, j]), through
                # reused scratch (same values, zero fresh temporaries)
                splitmix64_into(acc, z, t)
                np.bitwise_xor(z, win[:, j], out=z)
                splitmix64_into(z, acc, t)
    else:
        acc = np.empty(0, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(vcounts)])
    out_counts = np.maximum(vcounts - n + 1, 1)
    offs = np.concatenate([[0], np.cumsum(out_counts)])
    flat = np.empty(offs[-1], dtype=np.uint64)
    # a doc with fewer than n tokens gets one shingle: the hash of its
    # lowercased full text (never a shared sentinel — that would pair
    # every two short docs as Jaccard-1.0 false duplicates)
    short = vcounts < n
    full_hash = hash_str_u64([t.lower() for t in texts]) if short.any() else None
    for i in range(len(texts)):   # per-doc memcpy only, no hashing
        if vcounts[i] < n:
            flat[offs[i]] = full_hash[i]
        else:
            flat[offs[i]:offs[i + 1]] = acc[starts[i]:starts[i] + out_counts[i]]
    return flat, offs


def _word_ngram_sets(texts: list[str], n: int = 3) -> list[np.ndarray]:
    flat, offs = _flat_word_ngram_hashes(texts, n)
    return [np.unique(flat[offs[i]:offs[i + 1]]) for i in range(len(texts))]


class WordNgramBands:
    """map_batches stage: LSH banding over word-n-gram MinHash signatures
    (token-level, order-sensitive — the true n-gram variant, not a
    char-window approximation)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, bands: int = 16, n: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.n, self.seed = num_perm, bands, n, seed
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        flat, offs = _flat_word_ngram_hashes(texts, self.n)
        m = len(texts)
        sigs = _sigs_from_flat(flat, offs, self.num_perm, self.seed)
        bh = np.empty((m, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            acc = seg[:, 0].copy()
            with np.errstate(over="ignore"):
                for j in range(1, self.rows_per_band):
                    acc = splitmix64(acc ^ seg[:, j])
            bh[:, b] = acc
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.bands)),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), m)),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            "sig64": pa.array(np.repeat(_fold_sig64(sigs), self.bands)),
        })


def ngram_jaccard_pairs(docs, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5, concurrency=None):
    """Word n-gram Jaccard near-dup: the distributed MinHash-LSH pipeline
    (pair emission in map_groups, join-attached texts, vectorized verify,
    union-find on verified pairs) with TRUE token-level n-gram shingles
    for both the signatures and the exact verification."""
    bander = WordNgramBands(text_col=text_col, id_col=id_col, n=n)
    return _text_lsh_clusters(docs, bander,
                              lambda texts: _word_ngram_sets(texts, n),
                              text_col, id_col, threshold)


_POPCNT8_J = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                           axis=1).sum(axis=1).astype(np.int64)


def _jaccard_join_bitmask(docs, text_col, id_col, threshold, sets_fn,
                          vocab, id_type, row_chunk_elems=4_000_000):
    """Small-universe fast path: token universe <= 64, so every key's
    set is ONE uint64 bitmask and the exact verify is popcount(AND) —
    the regime where prefix filtering degenerates (every token is in
    most prefixes, candidates ~ all-pairs) is exactly where bitmask
    all-pairs is optimal. The (id, mask, size) table is broadcast
    (valid while keys fit worker RAM — the generic prefix path covers
    everything else); each map task compares its rows against the full
    table in row chunks, emitting a pair only from the row with the
    SMALLER id so output pairs are distinct by construction."""
    import ray

    def mask_rows(batch: pa.Table) -> pa.Table:
        sets = sets_fn(batch[text_col].to_pylist())
        m = len(sets)
        sizes = np.asarray([s.size for s in sets], dtype=np.int64)
        masks = np.zeros(m, dtype=np.uint64)
        if m and sizes.sum():
            flat = np.concatenate(sets)
            doc = np.repeat(np.arange(m), sizes)
            bits = np.searchsorted(vocab, flat).astype(np.uint64)
            np.bitwise_or.at(masks, doc, np.uint64(1) << bits)
        return pa.table({id_col: batch[id_col],
                         "_mask": pa.array(masks.view(np.int64)),
                         "_sz": pa.array(sizes)})

    masks = docs.map_batches(mask_rows, batch_format="pyarrow") \
        .materialize()
    rows = masks.take_all()
    aid = np.asarray([r[id_col] for r in rows])
    amask = np.asarray([r["_mask"] for r in rows],
                       dtype=np.int64).view(np.uint64)
    asz = np.asarray([r["_sz"] for r in rows], dtype=np.int64)
    o = np.argsort(aid)
    ref = ray.put((aid[o], amask[o], asz[o]))

    empty = pa.table({"a": pa.array([], type=id_type),
                      "b": pa.array([], type=id_type),
                      "inter_sz": pa.array([], type=pa.int64()),
                      "union_sz": pa.array([], type=pa.int64()),
                      "jacc": pa.array([], type=pa.float64())})

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, masks_all, sz_all = ray.get(ref)
        nall = len(ids_all)
        rid = np.asarray(batch[id_col].to_pylist())
        rmask = batch["_mask"].to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        rsz = batch["_sz"].to_numpy(zero_copy_only=False)
        out = []
        step = max(1, row_chunk_elems // max(nall, 1))
        for lo in range(0, len(rid), step):
            hi = min(lo + step, len(rid))
            mm = rmask[lo:hi, None] & masks_all[None, :]
            inter = _POPCNT8_J[mm.view(np.uint8)
                               .reshape(hi - lo, nall, 8)].sum(axis=2)
            union = rsz[lo:hi, None] + sz_all[None, :] - inter
            jacc = inter / np.maximum(union, 1)
            keep = (jacc >= threshold) & (rid[lo:hi, None] < ids_all[None, :])
            ri, ci = np.nonzero(keep)
            if len(ri):
                out.append(pa.table({
                    "a": pa.array(rid[lo:hi][ri].tolist(), type=id_type),
                    "b": pa.array(ids_all[ci].tolist(), type=id_type),
                    "inter_sz": pa.array(inter[ri, ci]),
                    "union_sz": pa.array(union[ri, ci]),
                    "jacc": pa.array(jacc[ri, ci])}))
        return pa.concat_tables(out) if out else empty

    return masks.map_batches(pairs, batch_format="pyarrow")


def jaccard_join(docs, text_col: str = "text", id_col: str = "doc_id",
                 threshold: float = 0.5, n: int = 3,
                 coarse: int | None = None,
                 df_broadcast_cap: int = 4_000_000,
                 sets_fn=None, small_universe_cap: int = 64,
                 bitmask_key_cap: int = 2_000_000):
    """EXACT Jaccard set-similarity self-join over word-n-gram shingle
    sets via prefix filtering (Chaudhuri et al. 2006 SSJoin / Bayardo et
    al. 2007 All-Pairs — public algorithms): every pair with shingle-set
    Jaccard >= threshold, no LSH recall loss. The reference analogy is
    tags-filter's exact match semantics vs an approximate index
    (/root/reference/src/command_tags_filter.cpp) — this is the exact
    twin of ngram_jaccard_pairs.

    Prefix filter: under ANY global token order, a pair with J >= t must
    share a token inside each doc's first p = s - ceil(t*s) + 1 ordered
    tokens, so only prefix tokens are exploded. Tokens are ordered
    rarest-first by (df, hash) — a one-pass mergeable document-frequency
    fold — which keeps prefix-token groups small (a prefix token has low
    df by construction). Above `df_broadcast_cap` distinct shingles the
    df map would exceed worker RAM, so ordering falls back to raw hash
    order: correctness is ORDER-INDEPENDENT (only pruning selectivity
    changes), so there is no scale cliff, just gradually coarser
    pruning. Size filter min(sa,sb) >= t*max(sa,sb) prunes pairs before
    emission; exact verify recomputes full sets per pair.

    Scale shape: df partials are per-batch-distinct before ONE 32-bucket
    fold; prefix rows (token, id, size) are narrow; pair emission runs
    inside O(CPUs) coarse groups (complete per fine token run — no
    star/chain cap, exactness requires every pair); ONE pair-hash bucket
    distinct removes cross-token duplicates; texts attach via two native
    hash joins (_attach_pair_payload) and the verify is vectorized per
    batch. No doc row ever reaches the driver.

    Returns (a, b, inter_sz, union_sz, jacc) with a < b; jacc is the
    single IEEE division inter/union (bit-identical to the SQL twin).

    `sets_fn(payloads) -> list[np.ndarray(uint64)]` swaps the token
    universe: given the batch's `text_col` values it must return each
    row's SORTED UNIQUE token-hash set (default: word-n-gram shingles).
    Any set-valued payload joins this way — e.g. per-user visited-cell
    sets packed as binary with an unpacking sets_fn."""
    import ray

    if coarse is None:
        coarse = max(8, int(ray.cluster_resources().get("CPU", 8)))
    if sets_fn is None:
        sets_fn = lambda texts: _word_ngram_sets(texts, n)  # noqa: E731

    s = docs.schema()
    id_type = dict(zip(s.names, s.types))[id_col]

    # pass 1: token document frequencies (sets are unique per row, so
    # the per-batch partial is one sort + run-length count)
    def df_partial(batch: pa.Table) -> pa.Table:
        sets = sets_fn(batch[text_col].to_pylist())
        flat = np.sort(np.concatenate(sets)) if sets \
            else np.empty(0, np.uint64)
        neww = np.ones(len(flat), dtype=bool)
        neww[1:] = flat[1:] != flat[:-1]
        vals = flat[neww]
        cnt = np.diff(np.append(np.flatnonzero(neww), len(flat)))
        return pa.table({
            "sh": pa.array(vals.view(np.int64)),
            "df": pa.array(cnt.astype(np.int64)),
            "_b": pa.array((vals % np.uint64(32)).astype(np.int32))})

    def df_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "sh" not in g.schema.names:
            return pa.table({"sh": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        agg = g.select(["sh", "df"]).group_by("sh").aggregate([("df", "sum")])
        return pa.table({"sh": agg["sh"].cast(pa.int64()),
                         "df": agg["df_sum"].cast(pa.int64())})

    dfd = docs.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(df_fold, batch_format="pyarrow") \
        .materialize()
    nv = dfd.count()
    if 0 < nv <= small_universe_cap and docs.count() <= bitmask_key_cap:
        # tiny token universe: prefix filtering degenerates (every
        # token sits in most prefixes) — switch to the exact bitmask
        # all-pairs path. Gated on KEY COUNT too: the bitmask table
        # broadcasts one row per key and each task compares all-pairs,
        # so a billion-key table with 50 distinct tokens must NOT
        # auto-route here — past the cap the generic prefix path runs
        # (coarser pruning, but bucketed end to end)
        tbls = list(dfd.iter_batches(batch_size=None,
                                     batch_format="pyarrow"))
        vocab = np.sort(pa.concat_tables(tbls)["sh"]
                        .to_numpy(zero_copy_only=False).view(np.uint64))
        return _jaccard_join_bitmask(docs, text_col, id_col, threshold,
                                     sets_fn, vocab, id_type)
    rank_ref = None
    if nv <= df_broadcast_cap:
        tbls = [r for r in dfd.iter_batches(batch_size=None,
                                            batch_format="pyarrow")]
        dft = pa.concat_tables(tbls) if tbls else None
        if dft is not None and dft.num_rows:
            sh = dft["sh"].to_numpy(zero_copy_only=False).view(np.uint64)
            dfv = dft["df"].to_numpy(zero_copy_only=False)
            by_hash = np.argsort(sh)
            sh_sorted = sh[by_hash]
            # rank in (df, sh) order, addressed by position in hash order
            by_rare = np.lexsort((sh_sorted, dfv[by_hash]))
            rank = np.empty(len(sh), dtype=np.int64)
            rank[by_rare] = np.arange(len(sh))
            rank_ref = ray.put((sh_sorted, rank))

    # pass 2: per-doc prefix emission (token, id, set size)
    def prefix_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = np.asarray(batch[id_col].to_pylist())
        sets = sets_fn(texts)
        sizes = np.asarray([len(st) for st in sets], dtype=np.int64)
        if len(sets) == 0 or sizes.sum() == 0:
            return pa.table({
                "tok": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=id_type),
                "sz": pa.array([], type=pa.int64()),
                "_cb": pa.array([], type=pa.int32())})
        # fully vectorized prefix pick: flatten all sets, order each
        # doc's tokens rarest-first (one lexsort over (doc, rank)), keep
        # positions < p(doc) via segmented arithmetic — no per-doc loop
        flat = np.concatenate(sets)
        doc_idx = np.repeat(np.arange(len(sets)), sizes)
        if rank_ref is not None:
            sh_sorted, rank = ray.get(rank_ref)
            keyv = rank[np.searchsorted(sh_sorted, flat)]
        else:
            keyv = flat            # raw hash order (documented fallback)
        o = np.lexsort((keyv, doc_idx))
        flat, doc_idx = flat[o], doc_idx[o]
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        pos = np.arange(len(flat)) - starts[doc_idx]
        # epsilon guards the float ceil DOWN: a too-large ceil would
        # shorten the prefix and silently drop true pairs; too-small
        # only lengthens it (pure pruning loss, never a miss)
        p = sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1
        keep = pos < p[doc_idx]
        tok, doc_idx, pos = flat[keep], doc_idx[keep], pos[keep]
        return pa.table({
            "tok": pa.array(tok.view(np.int64)),
            id_col: pa.array(ids[doc_idx].tolist(), type=id_type),
            "sz": pa.array(sizes[doc_idx]),
            "pos": pa.array(pos),
            "_cb": pa.array((splitmix64(tok) % np.uint64(coarse))
                            .astype(np.int32))})

    pair_schema = pa.schema([("a", id_type), ("b", id_type)])

    # pass 3: complete pair emission per fine token run (size-filtered,
    # plus the PPJoin positional filter — Xiao, Wang, Lin, Yu 2008,
    # public algorithm: a shared prefix token at 0-based positions
    # (px, py) of the docs' globally-ordered token arrays bounds the
    # overlap of the pair's FIRST common token by
    # 1 + min(sx - px - 1, sy - py - 1); J >= t needs overlap >=
    # t/(1+t) * (sx + sy). Applying the bound at EVERY shared-token
    # emission is sound: the first-common-token emission's bound is
    # exact-valid, so a qualifying pair always survives through it —
    # over-pruning can only hit redundant duplicate emissions.)
    req_f = threshold / (1.0 + threshold)

    def emit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tok" not in g.schema.names:
            return pair_schema.empty_table()
        tok = g["tok"].to_numpy(zero_copy_only=False)
        ids = np.asarray(g[id_col].to_pylist())
        szs = g["sz"].to_numpy(zero_copy_only=False)
        pss = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, szs, tok))
        tok, ids, szs, pss = tok[order], ids[order], szs[order], pss[order]
        new = np.ones(len(tok), dtype=bool)
        new[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(tok))
        outa, outb = [], []
        for st, en in zip(starts, ends):
            m = en - st
            if m < 2:
                continue
            uid, usz, ups = ids[st:en], szs[st:en], pss[st:en]
            ai, bi = np.triu_indices(m, k=1)
            # rows are size-ascending within the run: usz[ai] <= usz[bi];
            # epsilon keeps the float product from over-pruning boundaries
            keep = usz[ai] >= threshold * usz[bi] - 1e-9
            # positional filter (epsilon RAISES the bound side /
            # LOWERS required — only ever prunes less, never a miss)
            ubound = 1 + np.minimum(usz[ai] - ups[ai], usz[bi] - ups[bi]) - 1
            keep &= ubound >= req_f * (usz[ai] + usz[bi]) - 1e-9
            ai, bi = ai[keep], bi[keep]
            if len(ai) == 0:
                continue
            a_, b_ = uid[ai], uid[bi]
            lo = a_ <= b_
            outa.append(np.where(lo, a_, b_))
            outb.append(np.where(lo, b_, a_))
        if not outa:
            return pair_schema.empty_table()
        a_, b_ = np.concatenate(outa), np.concatenate(outb)
        o = np.lexsort((b_, a_))
        a_, b_ = a_[o], b_[o]
        first = np.ones(len(a_), dtype=bool)
        first[1:] = (a_[1:] != a_[:-1]) | (b_[1:] != b_[:-1])
        first &= a_ != b_    # same id twice under one token (dup rows)
        return pa.table({"a": pa.array(a_[first].tolist(), type=id_type),
                         "b": pa.array(b_[first].tolist(), type=id_type)})

    # pass 3.5: global pair distinct (a pair can share several prefix
    # tokens whose coarse groups differ) — ONE narrow pair-hash bucket
    def add_pb(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table() \
                .append_column("_pb", pa.array([], type=pa.int32()))
        ha = hash_str_u64(batch["a"].cast(pa.string()))
        hb = hash_str_u64(batch["b"].cast(pa.string()))
        with np.errstate(over="ignore"):
            h = splitmix64(ha ^ splitmix64(hb))
        return batch.append_column(
            "_pb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    def pair_distinct(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "a" not in g.schema.names:
            return pair_schema.empty_table()
        a_ = np.asarray(g["a"].to_pylist())
        b_ = np.asarray(g["b"].to_pylist())
        o = np.lexsort((b_, a_))
        a_, b_ = a_[o], b_[o]
        first = np.ones(len(a_), dtype=bool)
        first[1:] = (a_[1:] != a_[:-1]) | (b_[1:] != b_[:-1])
        return pa.table({"a": pa.array(a_[first].tolist(), type=id_type),
                         "b": pa.array(b_[first].tolist(), type=id_type)})

    prefixes = docs.map_batches(prefix_rows, batch_format="pyarrow")
    raw_pairs = prefixes.groupby("_cb").map_groups(
        emit, batch_format="pyarrow")
    pruned = _drop_empty_blocks(raw_pairs)
    pairs = None if pruned is None else _drop_empty_blocks(
        pruned.map_batches(add_pb, batch_format="pyarrow")
        .groupby("_pb").map_groups(pair_distinct, batch_format="pyarrow"))
    if pairs is not None:
        # narrow (a, b) rows; materialize so the count guard and the
        # payload joins don't each re-execute the whole pair lineage
        pairs = pairs.materialize()
    if pairs is None or pairs.count() == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], type=id_type),
            "b": pa.array([], type=id_type),
            "inter_sz": pa.array([], type=pa.int64()),
            "union_sz": pa.array([], type=pa.int64()),
            "jacc": pa.array([], type=pa.float64())}))
    # tokenize each doc ONCE map-side and attach PACKED uint64 sets, not
    # text — star-shaped candidate lists would otherwise make every
    # verify task re-tokenize most of the corpus (see _text_lsh_clusters)
    def pack_sets(batch: pa.Table) -> pa.Table:
        sets = sets_fn(batch[text_col].to_pylist())
        return pa.table({
            id_col: batch[id_col],
            "packed": pa.array([st.tobytes() for st in sets],
                               type=pa.binary())})

    packed = docs.map_batches(pack_sets, batch_format="pyarrow")

    def verify(batch: pa.Table) -> pa.Table:
        ids_a = batch["a"].to_pylist()
        ids_b = batch["b"].to_pylist()
        pka = batch["packed_a"].to_pylist()
        pkb = batch["packed_b"].to_pylist()
        set_of: dict = {}
        for i, buf in zip(ids_a, pka):
            if i not in set_of:
                set_of[i] = np.frombuffer(buf, dtype=np.uint64)
        for i, buf in zip(ids_b, pkb):
            if i not in set_of:
                set_of[i] = np.frombuffer(buf, dtype=np.uint64)
        na, nb, inter = _pair_set_inters(ids_a, ids_b, set_of)
        union = na + nb - inter
        jacc = inter / np.maximum(union, 1)
        jacc[union == 0] = 1.0
        keep = pa.array(jacc >= threshold)
        return pa.table({
            "a": batch["a"], "b": batch["b"],
            "inter_sz": pa.array(inter), "union_sz": pa.array(union),
            "jacc": pa.array(jacc)}).filter(keep)

    def verify_indexed(sub: pa.Table, pos_a, pos_b, state) -> pa.Table:
        if sub.num_rows == 0 or state is None:
            return pa.table({
                "a": sub["a"], "b": sub["b"],
                "inter_sz": pa.array([], type=pa.int64()),
                "union_sz": pa.array([], type=pa.int64()),
                "jacc": pa.array([], type=pa.float64())})
        sz = state[2]
        inter = _pair_set_inters_idx(pos_a, pos_b, state)
        union = sz[pos_a] + sz[pos_b] - inter
        jacc = inter / np.maximum(union, 1)
        jacc[union == 0] = 1.0
        keep = pa.array(jacc >= threshold)
        return pa.table({
            "a": sub["a"], "b": sub["b"],
            "inter_sz": pa.array(inter), "union_sz": pa.array(union),
            "jacc": pa.array(jacc)}).filter(keep)

    return _attach_pair_payload(pairs, packed, id_col, "packed",
                                consume=verify,
                                consume_indexed=verify_indexed,
                                decode_payload=_decode_packed_u64)


def containment_join(docs, text_col: str = "text", id_col: str = "doc_id",
                     threshold: float = 0.6, n: int = 3,
                     coarse: int | None = None,
                     df_broadcast_cap: int = 4_000_000, sets_fn=None):
    """EXACT asymmetric containment self-join over word-n-gram shingle
    sets: every DIRECTED pair (a, b) with |Sa ∩ Sb| / |Sa| >= threshold
    — "a is (near-)contained in b", the quote/superset/decontamination
    screen where Jaccard fails because |Sb| may be unboundedly larger
    (the asymmetric variant of SSJoin prefix filtering, Chaudhuri et
    al. 2006 §4; reference analogy: tags-filter's subset semantics,
    /root/reference/src/command_tags_filter.cpp).

    Prefix rule: under ANY global token order, C(a→b) >= t forces a's
    first p = s - ceil(t*s) + 1 ordered tokens to intersect b's FULL
    set — so a-side emits only prefixes while the b-side emits its
    whole set (the inverted-postings shape postings_docs already
    builds). Tokens order rarest-first by a mergeable (df, hash) fold
    (hash order past `df_broadcast_cap` — order affects only pruning,
    never correctness). Per-token emission is probe x postings with the
    size filter sb >= t*sa and the positional filter sa - pos >= t*sa;
    ONE directed-pair-hash distinct, then the exact verify runs fused
    inside the payload attach (packed uint64 sets, never text).

    Returns (a, b, inter_sz, a_sz, containment); containment is the
    single IEEE division inter/a_sz (bit-identical to the SQL twin)."""
    import ray

    if coarse is None:
        coarse = max(8, int(ray.cluster_resources().get("CPU", 8)))
    if sets_fn is None:
        sets_fn = lambda texts: _word_ngram_sets(texts, n)  # noqa: E731

    s = docs.schema()
    id_type = dict(zip(s.names, s.types))[id_col]

    def df_partial(batch: pa.Table) -> pa.Table:
        sets = sets_fn(batch[text_col].to_pylist())
        flat = np.sort(np.concatenate(sets)) if sets \
            else np.empty(0, np.uint64)
        neww = np.ones(len(flat), dtype=bool)
        neww[1:] = flat[1:] != flat[:-1]
        vals = flat[neww]
        cnt = np.diff(np.append(np.flatnonzero(neww), len(flat)))
        return pa.table({
            "sh": pa.array(vals.view(np.int64)),
            "df": pa.array(cnt.astype(np.int64)),
            "_b": pa.array((vals % np.uint64(32)).astype(np.int32))})

    def df_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "sh" not in g.schema.names:
            return pa.table({"sh": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        agg = g.select(["sh", "df"]).group_by("sh") \
            .aggregate([("df", "sum")])
        return pa.table({"sh": agg["sh"].cast(pa.int64()),
                         "df": agg["df_sum"].cast(pa.int64())})

    dfd = docs.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(df_fold, batch_format="pyarrow") \
        .materialize()
    rank_ref = None
    if dfd.count() <= df_broadcast_cap:
        tbls = [r for r in dfd.iter_batches(batch_size=None,
                                            batch_format="pyarrow")]
        dft = pa.concat_tables(tbls) if tbls else None
        if dft is not None and dft.num_rows:
            sh = dft["sh"].to_numpy(zero_copy_only=False).view(np.uint64)
            dfv = dft["df"].to_numpy(zero_copy_only=False)
            by_hash = np.argsort(sh)
            sh_sorted = sh[by_hash]
            by_rare = np.lexsort((sh_sorted, dfv[by_hash]))
            rank = np.empty(len(sh), dtype=np.int64)
            rank[by_rare] = np.arange(len(sh))
            rank_ref = ray.put((sh_sorted, rank))

    # probe (prefix, side=0) + postings (full, side=1) rows per doc
    def emit_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = np.asarray(batch[id_col].to_pylist())
        sets = sets_fn(texts)
        sizes = np.asarray([len(st) for st in sets], dtype=np.int64)
        if len(sets) == 0 or sizes.sum() == 0:
            return pa.table({
                "tok": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=id_type),
                "sz": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int8()),
                "_cb": pa.array([], type=pa.int32())})
        flat = np.concatenate(sets)
        doc_idx = np.repeat(np.arange(len(sets)), sizes)
        if rank_ref is not None:
            sh_sorted, rank = ray.get(rank_ref)
            keyv = rank[np.searchsorted(sh_sorted, flat)]
        else:
            keyv = flat
        o = np.lexsort((keyv, doc_idx))
        flat, doc_idx = flat[o], doc_idx[o]
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        pos = np.arange(len(flat)) - starts[doc_idx]
        p = sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1
        probe = pos < p[doc_idx]
        tok = np.concatenate([flat[probe], flat])
        didx = np.concatenate([doc_idx[probe], doc_idx])
        posv = np.concatenate([pos[probe], pos])
        side = np.concatenate([
            np.zeros(int(probe.sum()), dtype=np.int8),
            np.ones(len(flat), dtype=np.int8)])
        return pa.table({
            "tok": pa.array(tok.view(np.int64)),
            id_col: pa.array(ids[didx].tolist(), type=id_type),
            "sz": pa.array(sizes[didx]),
            "pos": pa.array(posv),
            "side": pa.array(side),
            "_cb": pa.array((splitmix64(tok) % np.uint64(coarse))
                            .astype(np.int32))})

    pair_schema = pa.schema([("a", id_type), ("b", id_type)])

    def emit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tok" not in g.schema.names:
            return pair_schema.empty_table()
        tok = g["tok"].to_numpy(zero_copy_only=False)
        ids = np.asarray(g[id_col].to_pylist())
        szs = g["sz"].to_numpy(zero_copy_only=False)
        pss = g["pos"].to_numpy(zero_copy_only=False)
        sd = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sd, tok))
        tok, ids, szs, pss, sd = (tok[order], ids[order], szs[order],
                                  pss[order], sd[order])
        new = np.ones(len(tok), dtype=bool)
        new[1:] = tok[1:] != tok[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(tok))
        outa, outb = [], []
        for st, en in zip(starts, ends):
            seg_sd = sd[st:en]
            nprobe = int((seg_sd == 0).sum())
            npost = (en - st) - nprobe
            if nprobe == 0 or npost == 0:
                continue
            # side-sorted: probes first, postings after
            pa_ids, pa_sz, pa_pos = (ids[st:st + nprobe],
                                     szs[st:st + nprobe],
                                     pss[st:st + nprobe])
            pb_ids = ids[st + nprobe:en]
            pb_sz = szs[st + nprobe:en]
            ai = np.repeat(np.arange(nprobe), npost)
            bi = np.tile(np.arange(npost), nprobe)
            keep = (pb_sz[bi] >= threshold * pa_sz[ai] - 1e-9) \
                & (pa_sz[ai] - pa_pos[ai]
                   >= threshold * pa_sz[ai] - 1e-9) \
                & (pa_ids[ai] != pb_ids[bi])
            if keep.any():
                outa.append(pa_ids[ai[keep]])
                outb.append(pb_ids[bi[keep]])
        if not outa:
            return pair_schema.empty_table()
        a_, b_ = np.concatenate(outa), np.concatenate(outb)
        o = np.lexsort((b_, a_))
        a_, b_ = a_[o], b_[o]
        first = np.ones(len(a_), dtype=bool)
        first[1:] = (a_[1:] != a_[:-1]) | (b_[1:] != b_[:-1])
        return pa.table({"a": pa.array(a_[first].tolist(), type=id_type),
                         "b": pa.array(b_[first].tolist(),
                                       type=id_type)})

    def add_pb(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table() \
                .append_column("_pb", pa.array([], type=pa.int32()))
        ha = hash_str_u64(batch["a"].cast(pa.string()))
        hb = hash_str_u64(batch["b"].cast(pa.string()))
        with np.errstate(over="ignore"):
            h = splitmix64(ha ^ splitmix64(splitmix64(hb)))
        return batch.append_column(
            "_pb", pa.array((h % np.uint64(coarse)).astype(np.int32)))

    def pair_distinct(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "a" not in g.schema.names:
            return pair_schema.empty_table()
        a_ = np.asarray(g["a"].to_pylist())
        b_ = np.asarray(g["b"].to_pylist())
        o = np.lexsort((b_, a_))
        a_, b_ = a_[o], b_[o]
        first = np.ones(len(a_), dtype=bool)
        first[1:] = (a_[1:] != a_[:-1]) | (b_[1:] != b_[:-1])
        return pa.table({"a": pa.array(a_[first].tolist(), type=id_type),
                         "b": pa.array(b_[first].tolist(),
                                       type=id_type)})

    rows = docs.map_batches(emit_rows, batch_format="pyarrow")
    raw_pairs = rows.groupby("_cb").map_groups(emit,
                                               batch_format="pyarrow")
    pruned = _drop_empty_blocks(raw_pairs)
    pairs = None if pruned is None else _drop_empty_blocks(
        pruned.map_batches(add_pb, batch_format="pyarrow")
        .groupby("_pb").map_groups(pair_distinct,
                                   batch_format="pyarrow"))
    if pairs is not None:
        pairs = pairs.materialize()
    empty = pa.table({"a": pa.array([], type=id_type),
                      "b": pa.array([], type=id_type),
                      "inter_sz": pa.array([], type=pa.int64()),
                      "a_sz": pa.array([], type=pa.int64()),
                      "containment": pa.array([], type=pa.float64())})
    if pairs is None or pairs.count() == 0:
        return ray.data.from_arrow(empty)

    def pack_sets(batch: pa.Table) -> pa.Table:
        sets = sets_fn(batch[text_col].to_pylist())
        return pa.table({
            id_col: batch[id_col],
            "packed": pa.array([st.tobytes() for st in sets],
                               type=pa.binary())})

    packed = docs.map_batches(pack_sets, batch_format="pyarrow")

    def verify(batch: pa.Table) -> pa.Table:
        ids_a = batch["a"].to_pylist()
        ids_b = batch["b"].to_pylist()
        set_of: dict = {}
        for i, buf in zip(ids_a, batch["packed_a"].to_pylist()):
            if i not in set_of:
                set_of[i] = np.frombuffer(buf, dtype=np.uint64)
        for i, buf in zip(ids_b, batch["packed_b"].to_pylist()):
            if i not in set_of:
                set_of[i] = np.frombuffer(buf, dtype=np.uint64)
        na, nb, inter = _pair_set_inters(ids_a, ids_b, set_of)
        cont = inter / np.maximum(na, 1)
        cont[na == 0] = 1.0
        keep = pa.array(cont >= threshold)
        return pa.table({
            "a": batch["a"], "b": batch["b"],
            "inter_sz": pa.array(inter), "a_sz": pa.array(na),
            "containment": pa.array(cont)}).filter(keep)

    def verify_indexed(sub: pa.Table, pos_a, pos_b, state) -> pa.Table:
        if sub.num_rows == 0 or state is None:
            return pa.table({
                "a": sub["a"], "b": sub["b"],
                "inter_sz": pa.array([], type=pa.int64()),
                "a_sz": pa.array([], type=pa.int64()),
                "containment": pa.array([], type=pa.float64())})
        sz = state[2]
        inter = _pair_set_inters_idx(pos_a, pos_b, state)
        na = sz[pos_a]
        cont = inter / np.maximum(na, 1)
        cont[na == 0] = 1.0
        keep = pa.array(cont >= threshold)
        return pa.table({
            "a": sub["a"], "b": sub["b"],
            "inter_sz": pa.array(inter),
            "a_sz": pa.array(na.astype(np.int64)),
            "containment": pa.array(cont)}).filter(keep)

    return _attach_pair_payload(pairs, packed, id_col, "packed",
                                consume=verify,
                                consume_indexed=verify_indexed,
                                decode_payload=_decode_packed_u64)


def cosine_tf_join(docs, threshold: float = 0.6, df_cap: int = 200,
                   text_col: str = "text", id_col: str = "doc_id",
                   coarse: int | None = None,
                   elig_broadcast_cap: int = 4_000_000):
    """EXACT cosine similarity self-join over sparse TERM-FREQUENCY
    vectors (whitespace-lowered words): every doc pair whose TF-vector
    cosine reaches `threshold`, restricted to the PAIR-CAPABLE
    vocabulary 2 <= df <= df_cap — words above the cap are stopwords
    whose per-word pair explosion is quadratic (the phash_neardup
    hot-bucket cap precedent: the cap is part of the operator contract
    and replicated by the SQL twin), df=1 words cannot co-occur.
    Norms use the same capped vocabulary, so scores are true cosines in
    the pruned term space.

    Exactness across engines: dot products and norms are INTEGER sums
    (order-free, overflow-free at int64 for tf*len envelopes up to
    ~3e9); cos = dot / (sqrt(na) * sqrt(nb)) is three correctly-rounded
    IEEE ops, so floats stringify bit-identically to SQL.

    Scale shape: per-doc tf is complete map-side (one text row per
    doc); df folds through the tfidf-style 32-bucket word shuffle; the
    eligible-word set broadcasts while it fits (`elig_broadcast_cap`
    rows) and AUTO-ROUTES to a fully-distributed word-hash bucketed
    semi-join + doc-hash norm fold above it (no driver/broadcast vocab
    — the _tfidf_topk_bucketed precedent; both paths bit-identical
    because every partial is an integer sum); per-word pair partials
    emit inside O(CPUs) word-hash coarse groups (bounded df_cap^2/2 per
    word); ONE pair-hash bucket fold sums dot partials and filters. No
    doc row reaches the driver on either path.

    Returns (id_a, id_b, dot:int64, cos:float64) with id_a < id_b,
    cos >= threshold. Reference analogy: the weighted counterpart of
    tags-filter's exact co-occurrence semantics
    (/root/reference/src/command_tags_filter.cpp)."""
    import ray
    import pyarrow.compute as pc

    if coarse is None:
        coarse = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def _tf_rows(batch: pa.Table):
        words = pc.split_pattern_regex(
            pc.utf8_lower(batch[text_col].cast(pa.string())), r"\s+")
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        w = np.asarray(pc.list_flatten(words).to_pylist()).astype(str) \
            if len(lens) else np.empty(0, dtype=str)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        keep = w != ""
        w, doc_idx = w[keep], doc_idx[keep]
        if len(w) == 0:
            return (np.empty(0, dtype=str), np.empty(0, np.int64),
                    np.empty(0, np.int64))
        o = np.lexsort((w, doc_idx))
        w, doc_idx = w[o], doc_idx[o]
        first = np.concatenate([[True], (w[1:] != w[:-1])
                                | (doc_idx[1:] != doc_idx[:-1])])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(w))).astype(np.int64)
        return w[starts], doc_idx[starts], tf

    # pass 1: document frequencies over per-doc-distinct words
    def df_partial(batch: pa.Table) -> pa.Table:
        uw, _, _ = _tf_rows(batch)
        uw.sort()
        neww = np.concatenate([[True], uw[1:] != uw[:-1]]) \
            if len(uw) else np.empty(0, bool)
        vals = uw[neww]
        cnt = np.diff(np.append(np.flatnonzero(neww), len(uw))) \
            if len(uw) else np.empty(0, np.int64)
        b = (hash_str_u64(pa.array(vals.tolist(), type=pa.string()))
             % np.uint64(32)).astype(np.int32) \
            if len(vals) else np.empty(0, np.int32)
        return pa.table({"word": pa.array(vals.tolist(), type=pa.string()),
                         "df": pa.array(cnt.astype(np.int64)),
                         "_b": pa.array(b)})

    def df_fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "word" not in g.schema.names:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        agg = g.select(["word", "df"]).group_by("word") \
            .aggregate([("df", "sum")])
        return pa.table({"word": agg["word"].cast(pa.string()),
                         "df": agg["df_sum"].cast(pa.int64())})

    dfd = docs.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("_b").map_groups(df_fold, batch_format="pyarrow") \
        .materialize()

    def _elig_filter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.schema.names:
            return pa.table({"word": pa.array([], type=pa.string())})
        dfv = batch["df"].to_numpy(zero_copy_only=False)
        keep = pa.array((dfv >= 2) & (dfv <= df_cap))
        return batch.select(["word"]).filter(keep)

    elig_ds = dfd.map_batches(_elig_filter,
                              batch_format="pyarrow").materialize()
    n_elig = elig_ds.count()

    s = docs.schema()
    id_type = dict(zip(s.names, s.types))[id_col]
    out_schema = pa.schema([("id_a", id_type), ("id_b", id_type),
                            ("dot", pa.int64()), ("cos", pa.float64())])

    # pass 2: eligible tf rows + per-doc capped-space norm, map-side
    def tf_emit(batch: pa.Table) -> pa.Table:
        ev = ray.get(eref)
        w, doc_idx, tf = _tf_rows(batch)
        empty = pa.table({"word": pa.array([], type=pa.string()),
                          id_col: pa.array([], type=id_type),
                          "tf": pa.array([], type=pa.int64()),
                          "nrm": pa.array([], type=pa.int64()),
                          "_cb": pa.array([], type=pa.int32())})
        if len(w) == 0 or len(ev) == 0:
            return empty
        pos = np.searchsorted(ev, w)
        pos[pos == len(ev)] = len(ev) - 1
        ok = ev[pos] == w
        w, doc_idx, tf = w[ok], doc_idx[ok], tf[ok]
        if len(w) == 0:
            return empty
        nrm = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(nrm, doc_idx, tf * tf)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hb = (hash_str_u64(pa.array(w.tolist(), type=pa.string()))
              % np.uint64(coarse)).astype(np.int32)
        return pa.table({"word": pa.array(w.tolist(), type=pa.string()),
                         id_col: pa.array(ids[doc_idx].tolist(),
                                          type=id_type),
                         "tf": pa.array(tf),
                         "nrm": pa.array(nrm[doc_idx]),
                         "_cb": pa.array(hb)})

    # pass 3: per-word pair dot partials inside coarse word groups
    def pair_partials(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=id_type),
                          "b": pa.array([], type=id_type),
                          "dp": pa.array([], type=pa.int64()),
                          "na": pa.array([], type=pa.int64()),
                          "nb": pa.array([], type=pa.int64()),
                          "_pb": pa.array([], type=pa.int32())})
        if g.num_rows == 0 or "word" not in g.schema.names:
            return empty
        w = np.asarray(g["word"].to_pylist()).astype(str)
        ids = np.asarray(g[id_col].to_pylist())
        tf = g["tf"].to_numpy(zero_copy_only=False)
        nrm = g["nrm"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, w))
        w, ids, tf, nrm = w[o], ids[o], tf[o], nrm[o]
        new = np.concatenate([[True], w[1:] != w[:-1]])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(w))
        oa, ob, odp, ona, onb = [], [], [], [], []
        for st, en in zip(starts, ends):
            m = en - st
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            ai += st
            bi += st
            oa.append(ids[ai])
            ob.append(ids[bi])
            odp.append(tf[ai] * tf[bi])
            ona.append(nrm[ai])
            onb.append(nrm[bi])
        if not oa:
            return empty
        a_ = np.concatenate(oa)
        b_ = np.concatenate(ob)
        dp = np.concatenate(odp)
        na = np.concatenate(ona)
        nb = np.concatenate(onb)
        ha = hash_str_u64(pa.array([str(x) for x in a_],
                                   type=pa.string()))
        hbb = hash_str_u64(pa.array([str(x) for x in b_],
                                    type=pa.string()))
        with np.errstate(over="ignore"):
            pb = (splitmix64(ha ^ splitmix64(hbb))
                  % np.uint64(coarse)).astype(np.int32)
        return pa.table({"a": pa.array(a_.tolist(), type=id_type),
                         "b": pa.array(b_.tolist(), type=id_type),
                         "dp": pa.array(dp), "na": pa.array(na),
                         "nb": pa.array(nb), "_pb": pa.array(pb)})

    # pass 4: pair-bucket fold -> dot sums, cosine filter
    def fold_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "a" not in g.schema.names:
            return out_schema.empty_table()
        agg = g.select(["a", "b", "dp", "na", "nb"]) \
            .group_by(["a", "b"]).aggregate([("dp", "sum"),
                                             ("na", "min"),
                                             ("nb", "min")])
        dot = agg["dp_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        na = agg["na_min"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nb = agg["nb_min"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # same op order as the SQL twin: dot / (sqrt(na) * sqrt(nb))
        cos = dot.astype(np.float64) / (np.sqrt(na) * np.sqrt(nb))
        keep = cos >= threshold
        return pa.table({
            "id_a": agg["a"].cast(id_type).filter(pa.array(keep)),
            "id_b": agg["b"].cast(id_type).filter(pa.array(keep)),
            "dot": pa.array(dot[keep]),
            "cos": pa.array(cos[keep])})

    def _pair_tail(tfn):
        parts = tfn.groupby("_cb").map_groups(pair_partials,
                                              batch_format="pyarrow")
        pruned = _drop_empty_blocks(parts)
        if pruned is None:
            return ray.data.from_arrow(out_schema.empty_table())
        out = _drop_empty_blocks(
            pruned.groupby("_pb").map_groups(fold_pairs,
                                             batch_format="pyarrow"))
        if out is None:
            return ray.data.from_arrow(out_schema.empty_table())
        return out

    if n_elig <= elig_broadcast_cap:
        # broadcast path: capped vocab fits one object — norms map-side
        elig_tbls = [t for t in ray.get(elig_ds.to_arrow_refs())
                     if t.num_rows]
        elig = np.sort(np.concatenate(
            [np.asarray(t["word"].to_pylist()).astype(str)
             for t in elig_tbls])) if elig_tbls \
            else np.empty(0, dtype=str)
        eref = ray.put(elig)
        return _pair_tail(docs.map_batches(tf_emit,
                                           batch_format="pyarrow"))

    # ------- bucketed scale path (open-web vocabulary) -------
    # No driver/broadcast vocab: tf rows and eligible words co-locate by
    # word-hash bucket for a sorted semi-join (the _tfidf_topk_bucketed
    # union shape, stages/text.py:350); surviving rows re-bucket by doc
    # hash so each doc's capped-space norm folds AND attaches inside one
    # group (all of a doc's eligible tf rows land together). Values are
    # integer sums either way, so both paths are bit-identical.
    buckets = 64

    def tf_side(batch: pa.Table) -> pa.Table:
        w, doc_idx, tf = _tf_rows(batch)
        if len(w) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=id_type),
                             "tf": pa.array([], type=pa.int64()),
                             "_b": pa.array([], type=pa.int32()),
                             "_side": pa.array([], type=pa.int8())})
        b = (hash_str_u64(pa.array(w.tolist(), type=pa.string()))
             % np.uint64(buckets)).astype(np.int32)
        return pa.table({"word": pa.array(w.tolist(), type=pa.string()),
                         id_col: batch[id_col].take(pa.array(doc_idx)),
                         "tf": pa.array(tf),
                         "_b": pa.array(b),
                         "_side": pa.array(np.zeros(len(w),
                                                    dtype=np.int8))})

    def elig_side(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.schema.names:
            return pa.table({"word": pa.array([], type=pa.string()),
                             id_col: pa.array([], type=id_type),
                             "tf": pa.array([], type=pa.int64()),
                             "_b": pa.array([], type=pa.int32()),
                             "_side": pa.array([], type=pa.int8())})
        wcol = batch["word"].cast(pa.string())
        b = (hash_str_u64(wcol) % np.uint64(buckets)).astype(np.int32)
        n = batch.num_rows
        return pa.table({"word": wcol,
                         id_col: pa.nulls(n, id_type),
                         "tf": pa.array(np.zeros(n, dtype=np.int64)),
                         "_b": pa.array(b),
                         "_side": pa.array(np.ones(n, dtype=np.int8))})

    def join_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], type=pa.string()),
                          id_col: pa.array([], type=id_type),
                          "tf": pa.array([], type=pa.int64()),
                          "_db": pa.array([], type=pa.int32())})
        if g.num_rows == 0 or "word" not in g.schema.names:
            return empty
        side = g["_side"].to_numpy(zero_copy_only=False)
        w = np.asarray(g["word"].to_pylist()).astype(str)
        ew = np.sort(w[side == 1])
        rows = np.flatnonzero(side == 0)
        if not len(rows) or not len(ew):
            return empty
        tw = w[rows]
        pos = np.searchsorted(ew, tw)
        pos[pos == len(ew)] = len(ew) - 1
        sel = pa.array(rows[ew[pos] == tw])
        d = g[id_col].take(sel)
        db = (hash_str_u64(d.cast(pa.string()))
              % np.uint64(buckets)).astype(np.int32)
        return pa.table({"word": g["word"].take(sel).cast(pa.string()),
                         id_col: d,
                         "tf": g["tf"].take(sel).cast(pa.int64()),
                         "_db": pa.array(db)})

    def norm_attach(g: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], type=pa.string()),
                          id_col: pa.array([], type=id_type),
                          "tf": pa.array([], type=pa.int64()),
                          "nrm": pa.array([], type=pa.int64()),
                          "_cb": pa.array([], type=pa.int32())})
        if g.num_rows == 0 or "word" not in g.schema.names:
            return empty
        ids_np = g[id_col].to_numpy(zero_copy_only=False)
        key = ids_np.astype(str) if ids_np.dtype == object else ids_np
        _, inv = np.unique(key, return_inverse=True)
        tf = g["tf"].to_numpy(zero_copy_only=False)
        nrms = np.zeros(int(inv.max()) + 1, dtype=np.int64)
        np.add.at(nrms, inv, tf * tf)
        cb = (hash_str_u64(g["word"].cast(pa.string()))
              % np.uint64(coarse)).astype(np.int32)
        return pa.table({"word": g["word"].cast(pa.string()),
                         id_col: g[id_col],
                         "tf": pa.array(tf.astype(np.int64)),
                         "nrm": pa.array(nrms[inv]),
                         "_cb": pa.array(cb)})

    tagged = docs.map_batches(tf_side, batch_format="pyarrow") \
        .union(elig_ds.map_batches(elig_side, batch_format="pyarrow"))
    joined = _drop_empty_blocks(
        tagged.groupby("_b").map_groups(join_bucket,
                                        batch_format="pyarrow"))
    if joined is None:
        return ray.data.from_arrow(out_schema.empty_table())
    tfn = _drop_empty_blocks(
        joined.groupby("_db").map_groups(norm_attach,
                                         batch_format="pyarrow"))
    if tfn is None:
        return ray.data.from_arrow(out_schema.empty_table())
    return _pair_tail(tfn)


class HyperplaneSig:
    """map_batches actor: b-bit random-hyperplane signatures of an embedding
    column (cosine LSH), `tables` independent hash tables (multi-probe
    recall: a near-dup pair missed by one table is caught by another).
    Emits the narrow (id, table, sig) projection — one row per (row,
    table); vectors themselves never ride the signature shuffle.
    Hyperplanes are a seeded deterministic matrix built once per actor."""

    def __init__(self, dim: int, bits: int = 16, seed: int = 11,
                 tables: int = 1, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        rng = np.random.default_rng(seed)
        self.h = rng.normal(size=(dim, tables * bits))
        self.bits, self.tables = bits, tables
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.knn import embedding_matrix
        emb = embedding_matrix(batch[self.vec_col])
        n = len(batch)
        if emb.size == 0:
            sig = np.empty((n, self.tables), dtype=np.int64)
            sig.fill(0)
        else:
            proj = (emb @ self.h) > 0
            sig = np.zeros((n, self.tables), dtype=np.uint64)
            for t in range(self.tables):
                seg = proj[:, t * self.bits:(t + 1) * self.bits]
                for j in range(self.bits):
                    sig[:, t] |= seg[:, j].astype(np.uint64) << np.uint64(j)
            sig = sig.view(np.int64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.tables)),
            "table": pa.array(np.tile(np.arange(self.tables, dtype=np.int32), n)),
            "sig": pa.array(sig.reshape(-1)),
            "sig64": pa.array(np.repeat(_fold_sig64(sig.view(np.uint64)),
                                        self.tables)),
        })


def embedding_neardup(embeddings, dim: int, threshold: float = 0.95,
                      bits: int = 16, tables: int = 2,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      concurrency=None) -> pa.Table:
    """Embedding-cosine near-dup, distributed end-to-end: multi-table
    hyperplane-LSH bucketing on the narrow (id, table, sig) projection,
    candidate pairs emitted inside groupby(table, sig).map_groups,
    candidate vectors attached via two hash-partitioned Dataset.joins, and
    exact cosine verified in a vectorized map_batches stage. Only the
    verified pairs reach the driver. Returns (id, dup_of) pairs with
    dup_of = the smaller id."""
    # the hyperplane matrix is a few KB of seeded state — ship it in a
    # closure and run stateless (fuses with the read; no pool spin-up)
    sig_fn = HyperplaneSig(dim, bits, tables=tables, vec_col=vec_col,
                           id_col=id_col)
    sigs = embeddings.map_batches(lambda b: sig_fn(b), batch_format="pyarrow")

    s = embeddings.schema()
    id_type = dict(zip(s.names, s.types))[id_col]
    pairs = _bucket_pairs(sigs, ["table", "sig"], id_col, id_type,
                          sig_col="sig64")
    if pairs is None:
        return pa.table({id_col: pa.array([], type=id_type),
                         "dup_of": pa.array([], type=id_type)})

    # Acero (the join kernel under Dataset.join) rejects list-typed non-key
    # payloads — ship vectors as packed float64 bytes and decode in verify
    def pack(batch: pa.Table) -> pa.Table:
        from ..stages.knn import embedding_matrix
        m = embedding_matrix(batch[vec_col]).astype(np.float64)
        blobs = [m[i].tobytes() for i in range(len(m))]
        return pa.table({id_col: batch[id_col],
                         vec_col: pa.array(blobs, type=pa.binary())})

    packed = embeddings.map_batches(pack, batch_format="pyarrow")

    def _unpack(col) -> np.ndarray:
        rows = [np.frombuffer(b, dtype=np.float64) for b in col.to_pylist()]
        return np.stack(rows) if rows else np.empty((0, 0))

    def verify(batch: pa.Table) -> pa.Table:
        va = _unpack(batch[f"{vec_col}_a"])
        vb = _unpack(batch[f"{vec_col}_b"])
        if len(va) == 0:
            keep = np.zeros(0, dtype=bool)
        else:
            na = np.maximum(np.linalg.norm(va, axis=1), 1e-30)
            nb = np.maximum(np.linalg.norm(vb, axis=1), 1e-30)
            cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
            keep = cos >= threshold
        return batch.select(["a", "b"]).filter(pa.array(keep))

    def decode_vecs(pcol):
        # (n, d) matrix + precomputed row norms, built once per worker
        m = _unpack(pcol)
        return m, np.maximum(np.linalg.norm(m, axis=1), 1e-30)

    def verify_indexed(sub: pa.Table, pos_a, pos_b, state) -> pa.Table:
        if sub.num_rows == 0 or state is None:
            return sub
        m, norms = state
        va, vb = m[pos_a], m[pos_b]
        cos = np.einsum("ij,ij->i", va, vb) / (norms[pos_a] * norms[pos_b])
        return sub.filter(pa.array(cos >= threshold))

    out = _minlabel_union_tables(_pair_tables(_attach_pair_payload(
        pairs, packed, id_col, vec_col, consume=verify,
        consume_indexed=verify_indexed, decode_payload=decode_vecs)
        .map_batches(_star_contract, batch_format="pyarrow",
                     batch_size=None)))
    if not out:
        return pa.table({id_col: pa.array([], type=id_type),
                         "dup_of": pa.array([], type=id_type)})
    return pa.table({id_col: pa.array([o[0] for o in out]),
                     "dup_of": pa.array([o[1] for o in out])})


def _unpack_packed_matrix(col, dim: int) -> np.ndarray:
    """Packed float64 binary column -> (n, dim) matrix, zero-copy off the
    Arrow data buffer (records are equal-size by construction, so the
    offsets window is one contiguous slice — no per-row frombuffer)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    if len(arr) == 0:
        return np.empty((0, dim), dtype=np.float64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset:arr.offset + len(arr) + 1]
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    flat = buf[offs[0]:offs[-1]]
    return flat.view(np.float64).reshape(len(arr), dim)


def semantic_dedup(embeddings, dim: int, threshold: float = 0.9,
                   nlist: int = 16, iters: int = 2, chunk: int = 2048,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   seed: int = 13):
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then inside
    each cluster drop every vector whose cosine similarity to ANY
    lower-id vector reaches `threshold` — deterministic keep-first
    within semantic neighborhoods, the embedding-space analogue of exact
    dedup's hash-partition + per-group-first (no reference counterpart;
    training-data op).

    Scale shape: centroids via knn.train_ivf_centroids (ONE native
    keyed-Sum fold per Lloyd iteration — constant-size driver table at
    any corpus size); assignment map-side against the broadcast centroid
    matrix; ONE groupby(cluster) shuffle of narrow (id, packed
    unit-vector) rows; the exists-earlier-near-dup test runs blockwise
    in id order inside each group, peak memory O(chunk x cluster_size).
    Cluster size is operator-controlled — SemDeDup sizes k ~
    N / target_cluster_size for exactly this reason, so a web-scale run
    picks nlist so each cluster fits one worker's heap.

    Returns survivors (id_col, cluster:int64)."""
    import ray

    from .knn import embedding_matrix, train_ivf_centroids

    cents = train_ivf_centroids(embeddings, dim=dim, nlist=nlist,
                                iters=iters, vec_col=vec_col, seed=seed)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = embedding_matrix(batch[vec_col]).astype(np.float64)
        if len(m) == 0:
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.array([], type=pa.int64()),
                             "_v": pa.array([], type=pa.binary())})
        en = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        cl = np.argmax(en @ c.T, axis=1).astype(np.int64)
        blobs = [en[i].tobytes() for i in range(len(en))]
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(cl),
                         "_v": pa.array(blobs, type=pa.binary())})

    def dedup_cluster(g: pa.Table) -> pa.Table:
        id_type = g.schema.field(id_col).type
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], type=id_type),
                             "cluster": pa.array([], type=pa.int64())})
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        E = _unpack_packed_matrix(g["_v"], dim)[order]
        sid = ids[order]
        n = len(sid)
        dup = np.zeros(n, dtype=bool)
        for a in range(0, n, chunk):
            b = min(a + chunk, n)
            S = E[a:b] @ E[:b].T
            hit = (S[:, :a] >= threshold).any(axis=1) if a else \
                np.zeros(b - a, dtype=bool)
            strictly_before = (np.arange(a, b)[None, :]
                               < np.arange(a, b)[:, None])
            hit |= ((S[:, a:b] >= threshold) & strictly_before).any(axis=1)
            dup[a:b] = hit
        keep = ~dup
        cl = int(g["cluster"][0].as_py())
        return pa.table({id_col: pa.array(sid[keep]).cast(id_type),
                         "cluster": pa.array(
                             np.full(int(keep.sum()), cl, dtype=np.int64))})

    return embeddings.map_batches(assign, batch_format="pyarrow") \
        .groupby("cluster").map_groups(dedup_cluster, batch_format="pyarrow")


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64) ^ np.asarray(b).view(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def phash_neardup(images, t: int = 12, cap: int = 500,
                  id_col: str = "image_id", phash_col: str = "phash"):
    """Image near-duplicate pairs by perceptual-hash hamming LSH: the
    64-bit phash splits into four 16-bit bands; images sharing a band
    value are candidates; candidates verify at hamming(phash) <= t.

    Hot-bucket guard (the image-side analogue of the text LSH hot-bucket
    handling above): a band bucket holding more than `cap` rows is
    SKIPPED — in this corpus the top band is constant across all images
    (one planet-sized bucket), and at 10^12 rows any such degenerate
    band would otherwise emit O(n^2) candidate pairs. Cap semantics are
    part of the operator contract and replicated by the SQL oracle
    (HAVING count(*) BETWEEN 2 AND cap).

    Shapes: the (band, value) key space is bounded (4 x 2^16), so bucket
    sizes are computed FIRST with map-side partial bincounts merged on
    the driver (<= 512 KiB total) — hot buckets AND singleton buckets
    (the vast majority) are then dropped map-side via a broadcast
    searchsorted BEFORE the shuffle, so the groupby only ever moves rows
    that can emit pairs, and the shuffle key is a COARSE int32 bucket
    (each (band, v) bucket lands wholly in one group; lexsort splits it
    back inside the group task). Band explode is a stateless vectorized
    map (narrow (band, v, id, phash) rows — blobs never touched);
    per-bucket triu pair emission with the popcount verify fused in and
    duplicates suppressed at emission (first-kept-colliding-band rule),
    so there is NO second pair-dedup shuffle.
    Returns distinct (id_a, id_b) with id_a < id_b."""
    import ray

    NBUCKETS = 256

    def _band_vals(ph: np.ndarray) -> np.ndarray:
        # (4, n) band values of the uint64 hashes
        return np.stack([((ph >> np.uint64(48 - b * 16))
                          & np.uint64(0xFFFF)).astype(np.int64)
                         for b in range(4)])

    narrow = images.select_columns([id_col, phash_col])

    # pass 1: global bucket sizes via per-block bincount partials
    def count_buckets(batch: pa.Table) -> pa.Table:
        ph = batch[phash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        bv = _band_vals(ph)
        counts = np.zeros(4 * 65536, dtype=np.int64)
        for b in range(4):
            counts[b * 65536:(b + 1) * 65536] = np.bincount(
                bv[b], minlength=65536)
        return pa.table({"c": pa.array([counts.tobytes()],
                                       type=pa.binary())})

    total = np.zeros(4 * 65536, dtype=np.int64)
    for r in narrow.map_batches(count_buckets,
                                batch_format="pyarrow").take_all():
        total = total + np.frombuffer(r["c"], dtype=np.int64)
    keep_keys = np.flatnonzero((total >= 2) & (total <= cap))
    keep_ref = ray.put(keep_keys)

    def explode(batch: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        n = batch.num_rows
        ph = batch[phash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if not len(keep):
            return pa.table({
                "_b": pa.array([], type=pa.int32()),
                "band": pa.array([], type=pa.int32()),
                "v": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.string()),
                phash_col: pa.array([], type=pa.int64()),
            })
        bv = _band_vals(ph)
        bands, vs, oid, oph = [], [], [], []
        for b in range(4):
            key = b * 65536 + bv[b]
            pos = np.searchsorted(keep, key)
            sel = (pos < len(keep)) & (keep[np.minimum(pos, len(keep) - 1)]
                                       == key)
            bands.append(np.full(int(sel.sum()), b, dtype=np.int32))
            vs.append(bv[b][sel])
            oid.append(ids[sel])
            oph.append(ph.view(np.int64)[sel])
        band = np.concatenate(bands)
        v = np.concatenate(vs)
        # coarse shuffle key: a (band, v) bucket lands wholly in one of
        # NBUCKETS groups, so the groupby moves ONE small int32 key
        # instead of sort-shuffling the full 2^18 (band, v) key space
        # (the coarse-bucket lesson from the pair-dedup stages)
        coarse = ((band.astype(np.int64) * 65536 + v)
                  * 2654435761 % 2147483648 % NBUCKETS).astype(np.int32)
        return pa.table({
            "_b": pa.array(coarse),
            "band": pa.array(band),
            "v": pa.array(v),
            id_col: pa.array(np.concatenate(oid)),
            phash_col: pa.array(np.concatenate(oph)),
        })

    def emit_pairs(g: pa.Table) -> pa.Table:
        """Per-bucket pair emission with hamming verify FUSED in, and
        duplicate suppression by construction: a pair is emitted only at
        its FIRST kept colliding band (an earlier band where both hashes
        agree AND that bucket survived the 2..cap filter would already
        have emitted it). This makes the output distinct without the
        downstream pair-dedup shuffle the old three-stage tail needed —
        at corpus scale that stage moved every candidate pair a second
        time and removed ~nothing."""
        empty = pa.table({"id_a": pa.array([], type=pa.string()),
                          "id_b": pa.array([], type=pa.string())})
        if g.num_rows == 0:
            return empty
        keep = ray.get(keep_ref)
        # a coarse group holds MANY (band, v) buckets: lexsort once,
        # then split runs on (band, v)
        band = g["band"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        ids_all = np.asarray(g[id_col].to_pylist(), dtype=object).astype(str)
        ph_all = g[phash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        srt = np.lexsort((v, band))
        band, v, ids_all, ph_all = band[srt], v[srt], ids_all[srt], ph_all[srt]
        key_change = np.concatenate(
            [[True], (band[1:] != band[:-1]) | (v[1:] != v[:-1])])
        starts = np.flatnonzero(key_change)
        ends = np.concatenate([starts[1:], [len(band)]])
        outs = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2 or n > cap:
                continue
            order = np.argsort(ids_all[s:e], kind="stable") + s
            ids, ph = ids_all[order], ph_all[order]
            ia, ib = np.triu_indices(n, 1)
            ok = hamming64(ph[ia], ph[ib]) <= t
            for eb in range(int(band[s])):
                shift = np.uint64(48 - eb * 16)
                bv = ((ph >> shift) & np.uint64(0xFFFF)).astype(np.int64)
                key = eb * 65536 + bv
                pos = np.searchsorted(keep, key)
                kept = (pos < len(keep)) \
                    & (keep[np.minimum(pos, len(keep) - 1)] == key)
                ok &= ~((bv[ia] == bv[ib]) & kept[ia])
            if ok.any():
                outs.append(pa.table({
                    "id_a": pa.array(ids[ia[ok]], type=pa.string()),
                    "id_b": pa.array(ids[ib[ok]], type=pa.string()),
                }))
        return pa.concat_tables(outs) if outs else empty

    return images.select_columns([id_col, phash_col]) \
        .map_batches(explode, batch_format="pyarrow") \
        .groupby("_b") \
        .map_groups(emit_pairs, batch_format="pyarrow")


def colocated_pairs(images, level: int = 6, cap: int = 500,
                    id_col: str = "image_id",
                    lon_col: str = "lon", lat_col: str = "lat"):
    """Image pairs sharing a lon/lat grid cell at `level` — the spatial
    co-location signal for cross-modal dedup (burst shots / re-uploads
    of the same scene land in the same cell).

    Same scale discipline as phash_neardup: cell-key bucket sizes are
    pre-counted with mergeable per-block bincounts over the bounded
    2^level x 2^level key space, hot (> cap) and singleton cells are
    dropped map-side BEFORE the shuffle, and per-cell triu pair emission
    is bounded by cap. Returns (id_a, id_b), id_a < id_b."""
    import ray

    from ..functions.cells import lonlat_to_xy

    n_side = 1 << level
    n_keys = n_side * n_side

    def cell_key(batch: pa.Table) -> np.ndarray:
        x, y = lonlat_to_xy(batch[lon_col].to_numpy(zero_copy_only=False),
                            batch[lat_col].to_numpy(zero_copy_only=False),
                            level)
        return (y * n_side + x).astype(np.int64)

    narrow = images.select_columns([id_col, lon_col, lat_col])

    def count_cells(batch: pa.Table) -> pa.Table:
        counts = np.bincount(cell_key(batch), minlength=n_keys)
        return pa.table({"c": pa.array([counts.astype(np.int64).tobytes()],
                                       type=pa.binary())})

    total = np.zeros(n_keys, dtype=np.int64)
    for r in narrow.map_batches(count_cells,
                                batch_format="pyarrow").take_all():
        total = total + np.frombuffer(r["c"], dtype=np.int64)
    keep = np.flatnonzero((total >= 2) & (total <= cap))
    keep_ref = ray.put(keep)

    def tag(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        if not len(ks):
            return pa.table({"_b": pa.array([], type=pa.int32()),
                             "cell": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.string())})
        key = cell_key(batch)
        pos = np.searchsorted(ks, key)
        sel = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == key)
        kept = key[sel]
        # coarse int32 shuffle key (each cell lands wholly in one group)
        coarse = (kept * 2654435761 % 2147483648 % 256).astype(np.int32)
        return pa.table({
            "_b": pa.array(coarse),
            "cell": pa.array(kept),
            id_col: batch[id_col].filter(pa.array(sel)).cast(pa.string()),
        })

    def emit(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.string()),
                          "id_b": pa.array([], type=pa.string())})
        if g.num_rows == 0:
            return empty
        cell = g["cell"].to_numpy(zero_copy_only=False)
        ids_all = np.asarray(g[id_col].to_pylist(), dtype=object).astype(str)
        srt = np.argsort(cell, kind="stable")
        cell, ids_all = cell[srt], ids_all[srt]
        starts = np.flatnonzero(
            np.concatenate([[True], cell[1:] != cell[:-1]]))
        ends = np.concatenate([starts[1:], [len(cell)]])
        outs = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2 or n > cap:
                continue
            ids = np.sort(ids_all[s:e])
            ia, ib = np.triu_indices(n, 1)
            outs.append(pa.table({"id_a": pa.array(ids[ia], type=pa.string()),
                                  "id_b": pa.array(ids[ib], type=pa.string())}))
        return pa.concat_tables(outs) if outs else empty

    return narrow.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(emit, batch_format="pyarrow")


def crossmodal_neardup(images, t: int = 12, cap: int = 500,
                       level: int = 6):
    """Cross-signal near-duplicate pairs: perceptual-hash LSH pairs
    UNIONed with spatial co-location pairs, each pair labeled `via` in
    {'phash', 'colocated', 'both'}.

    The two pair streams are narrow (id_a, id_b[, flag]) tables; the
    merge is one native Sum groupby over int flags (no pandas, no
    driver collection). The blobs never appear anywhere in this
    pipeline — both signals read only (phash | lon/lat) projections."""

    def flag(val_p: int, val_c: int):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "id_a" not in batch.schema.names:
                return pa.table({"id_a": pa.array([], type=pa.string()),
                                 "id_b": pa.array([], type=pa.string()),
                                 "p": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.int64())})
            n = batch.num_rows
            return pa.table({
                "id_a": batch["id_a"].cast(pa.string()),
                "id_b": batch["id_b"].cast(pa.string()),
                "p": pa.array(np.full(n, val_p, dtype=np.int64)),
                "c": pa.array(np.full(n, val_c, dtype=np.int64)),
            })
        return f

    pp = phash_neardup(images, t=t, cap=cap) \
        .map_batches(flag(1, 0), batch_format="pyarrow")
    cp = colocated_pairs(images, level=level, cap=cap) \
        .map_batches(flag(0, 1), batch_format="pyarrow")

    # Ray's native Aggregate sorts the raw key columns; on millions of
    # two-STRING-key pair rows that is ~10x a coarse int32 bucket
    # shuffle (the hash_distinct lesson, blocks.py). Each (id_a, id_b)
    # lands in exactly one bucket, so the per-bucket Arrow C++ hash
    # aggregate is exact and classification happens in place.
    from ..functions.hashing import hash_str_u64

    nbuckets = 64

    def bucket(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_b", pa.array([], type=pa.int32()))
        # hashing id_a alone is enough to co-locate a pair's copies (the
        # pair key is a superset of id_a) and halves the hash work
        b = (hash_str_u64(batch["id_a"].cast(pa.string()))
             % np.uint64(nbuckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def agg_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "id_a" not in g.schema.names:
            return pa.table({"id_a": pa.array([], type=pa.string()),
                             "id_b": pa.array([], type=pa.string()),
                             "via": pa.array([], type=pa.string())})
        summed = g.group_by(["id_a", "id_b"]).aggregate(
            [("p", "sum"), ("c", "sum")])
        p = summed["p_sum"].to_numpy(zero_copy_only=False) > 0
        c = summed["c_sum"].to_numpy(zero_copy_only=False) > 0
        via = np.where(p & c, "both", np.where(p, "phash", "colocated"))
        return pa.table({"id_a": summed["id_a"].cast(pa.string()),
                         "id_b": summed["id_b"].cast(pa.string()),
                         "via": pa.array(via, type=pa.string())})

    return pp.union(cp).map_batches(bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(agg_bucket, batch_format="pyarrow")


def _np_str(col) -> np.ndarray:
    """Arrow string column -> numpy object array (no-copy-ish helper,
    mirrors pipelines/extract._np_str without importing a pipeline)."""
    return np.asarray(col.to_pylist(), dtype=object)


def connected_components(pairs, a_col: str = "id_a", b_col: str = "id_b",
                         max_iters: int = 50, driver_cap: int = 5_000_000):
    """Connected components over a pair table -> one row per node
    (image_id, rep) where rep is the smallest id in the component — the
    canonical post-LSH step that turns verified duplicate PAIRS into
    duplicate CLUSTERS (keep rep, drop the rest).

    Two paths, chosen by pair count:
      * <= driver_cap pairs: path-compressed union-find on the driver
        (verified pair tables are a sliver of the corpus; this is the
        same driver-side shape the minhash cluster step uses), labels
        returned as a Dataset.
      * above the cap (or driver_cap=0 to force): distributed min-label
        propagation WITH pointer jumping — each iteration u takes
        min(rep(u), rep of neighbors) then rep(rep(u)), so a
        diameter-D component converges in O(log D) iterations
        (Shiloach-Vishkin shortcut). One iteration = four coarse-bucket
        shuffles; no driver-side graph. Convergence is detected by an
        order-insensitive 64-bit label checksum (the fileinfo
        content-hash trick; collision odds ~2^-40 per round).
    """
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    from ..functions.hashing import hash_str_u64

    if driver_cap and pairs.count() <= driver_cap:
        tbl = pa.concat_tables(
            [ray.get(r) for r in pairs.to_arrow_refs()],
            promote_options="permissive")
        if tbl.num_rows == 0 or a_col not in tbl.schema.names:
            return rd.from_arrow(pa.table(
                {"image_id": pa.array([], type=pa.string()),
                 "rep": pa.array([], type=pa.string())}))
        a = np.asarray(tbl[a_col].to_pylist(), dtype=object)
        b = np.asarray(tbl[b_col].to_pylist(), dtype=object)
        nodes, codes = np.unique(np.concatenate([a, b]).astype(str),
                                 return_inverse=True)
        ea, eb = codes[:len(a)], codes[len(a):]
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:        # path compression
                parent[x], x = root, parent[x]
            return root

        for x, y in zip(ea.tolist(), eb.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by smaller node id keeps rep = component min
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        reps = np.asarray([nodes[find(i)] for i in range(len(nodes))],
                          dtype=object)
        return rd.from_arrow(pa.table(
            {"image_id": pa.array(nodes, type=pa.string()),
             "rep": pa.array(reps, type=pa.string())}))

    nbuckets = 32

    def bucket_col(vals) -> pa.Array:
        b = (hash_str_u64(vals) % np.uint64(nbuckets)).astype(np.int32)
        return pa.array(b)

    # symmetric edge list (u <- v influence flows both ways)
    def sym(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or a_col not in batch.schema.names:
            return pa.table({"u": pa.array([], type=pa.string()),
                             "v": pa.array([], type=pa.string())})
        a = batch[a_col].cast(pa.string())
        b = batch[b_col].cast(pa.string())
        return pa.table({
            "u": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                   b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]),
            "v": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                                   a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
        })

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()

    # initial labels: rep(u) = u over the distinct node set
    def init_labels(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.schema.names:
            return pa.table({"u": pa.array([], type=pa.string()),
                             "rep": pa.array([], type=pa.string()),
                             "_b": pa.array([], type=pa.int32())})
        u = batch["u"]
        d = pa.table({"u": u}).group_by("u").aggregate([])
        return pa.table({"u": d["u"], "rep": d["u"],
                         "_b": bucket_col(d["u"])})

    def dedup_labels(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "u" not in g.schema.names:
            return pa.table({"u": pa.array([], type=pa.string()),
                             "rep": pa.array([], type=pa.string())})
        agg = g.select(["u", "rep"]).group_by("u").aggregate([("rep", "min")])
        return pa.table({"u": agg["u"].cast(pa.string()),
                         "rep": agg["rep_min"].cast(pa.string())})

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("_b").map_groups(dedup_labels, batch_format="pyarrow") \
        .materialize()

    def checksum(lab) -> int:
        total = np.uint64(0)
        for r in lab.map_batches(
                lambda b: pa.table({"h": pa.array([int(
                    np.bitwise_xor.reduce(hash_str_u64(
                        pc.binary_join_element_wise(
                            b["u"].cast(pa.string()),
                            b["rep"].cast(pa.string()), "|")))
                    if b.num_rows and "u" in b.schema.names else 0)],
                    type=pa.uint64())}),
                batch_format="pyarrow").take_all():
            total ^= np.uint64(r["h"])
        return int(total)

    # --- one min-join round: new_rep(u) = min(rep(u), min rep(k) over
    # query rows (u, k)). Queries side=0, labels side=1, joined per
    # coarse bucket of the key.
    _empty5 = pa.table({"k": pa.array([], type=pa.string()),
                        "u": pa.array([], type=pa.string()),
                        "rep": pa.array([], type=pa.string()),
                        "_b": pa.array([], type=pa.int32()),
                        "_s": pa.array([], type=pa.int8())})

    def tag_queries(kcol: str):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or kcol not in batch.schema.names:
                return _empty5
            return pa.table({"k": batch[kcol].cast(pa.string()),
                             "u": batch["u"].cast(pa.string()),
                             "rep": pa.nulls(batch.num_rows, pa.string()),
                             "_b": bucket_col(batch[kcol]),
                             "_s": pa.array(np.zeros(batch.num_rows,
                                                     dtype=np.int8))})
        return f

    def tag_labels(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.schema.names:
            return _empty5
        return pa.table({"k": batch["u"].cast(pa.string()),
                         "u": batch["u"].cast(pa.string()),
                         "rep": batch["rep"].cast(pa.string()),
                         "_b": bucket_col(batch["u"]),
                         "_s": pa.array(np.ones(batch.num_rows,
                                                dtype=np.int8))})

    def join_bucket(gt: pa.Table) -> pa.Table:
        if gt.num_rows == 0 or "k" not in gt.schema.names:
            return pa.table({"u": pa.array([], type=pa.string()),
                             "rep": pa.array([], type=pa.string()),
                             "_b": pa.array([], type=pa.int32())})
        s = gt["_s"].to_numpy(zero_copy_only=False)
        k = _np_str(gt["k"]).astype(str)
        lab_k = k[s == 1]
        lab_rep = _np_str(gt["rep"]).astype(str)[s == 1]
        o = np.argsort(lab_k)
        lab_k, lab_rep = lab_k[o], lab_rep[o]
        eu = _np_str(gt["u"]).astype(str)[s == 0]
        ek = k[s == 0]
        pos = np.searchsorted(lab_k, ek)
        pos_c = np.minimum(pos, max(len(lab_k) - 1, 0))
        found = (pos < len(lab_k)) & (lab_k[pos_c] == ek) \
            if len(lab_k) else np.zeros(len(ek), bool)
        # messages (u, rep(k)) plus the labels themselves pass through
        out_u = np.concatenate([eu[found], lab_k])
        out_r = np.concatenate([lab_rep[pos_c][found] if len(lab_k)
                                else np.empty(0, dtype=str), lab_rep])
        t = pa.table({"u": pa.array(out_u, type=pa.string()),
                      "rep": pa.array(out_r, type=pa.string())})
        return t.append_column("_b", bucket_col(t["u"]))

    def min_join(query_ds, kcol: str, lab):
        merged = query_ds.map_batches(tag_queries(kcol),
                                      batch_format="pyarrow") \
            .union(lab.map_batches(tag_labels, batch_format="pyarrow")) \
            .groupby("_b").map_groups(join_bucket, batch_format="pyarrow")
        # repartition pins the label block count: each groupby round
        # otherwise emits ~(input blocks) output blocks, doubling per
        # iteration until task-scheduling overhead dominates
        return merged.groupby("_b") \
            .map_groups(dedup_labels, batch_format="pyarrow") \
            .repartition(nbuckets // 2).materialize()

    import os as _os
    import time as _time

    _dbg = _os.environ.get("CC_DEBUG") == "1"
    prev = checksum(labels)
    for _it in range(max_iters):
        _t0 = _time.time()
        # neighbor round: u takes min over rep(v) of its neighbors
        labels = min_join(edges, "v", labels)
        # pointer-jumping round: u takes rep(rep(u)) — halves the
        # remaining path depth, so a diameter-D component converges in
        # O(log D) iterations instead of D (Shiloach-Vishkin shortcut)
        labels = min_join(labels, "rep", labels)
        cur = checksum(labels)
        if _dbg:
            print(f"cc iter {_it}: {_time.time() - _t0:.1f}s "
                  f"rows {labels.count()} blocks {labels.num_blocks()} "
                  f"checksum {cur:x}", flush=True)
        if cur == prev:
            break
        prev = cur

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.schema.names:
            return pa.table({"image_id": pa.array([], type=pa.string()),
                             "rep": pa.array([], type=pa.string())})
        return pa.table({"image_id": batch["u"].cast(pa.string()),
                         "rep": batch["rep"].cast(pa.string())})

    return labels.map_batches(finish, batch_format="pyarrow")


def _pad_matrix(strs: pa.Array, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, width) zero-padded uint8 byte matrix + true lengths for a
    string array (strings are caller-bounded to <= width bytes)."""
    arr = strs.cast(pa.large_string()).combine_chunks() \
        if isinstance(strs, pa.ChunkedArray) else strs.cast(pa.large_string())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=len(arr) + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(off[-1])) if off[-1] else \
        np.zeros(0, dtype=np.uint8)
    lens = np.diff(off)
    if lens.max(initial=0) > width:
        raise ValueError(f"string exceeds pad width {width}")
    mat = np.zeros((len(arr), width), dtype=np.uint8)
    cols = np.arange(width)[None, :]
    mask = cols < lens[:, None]
    mat[mask] = data
    return mat, lens.astype(np.int64)


def _rowhash(mat: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per row of a fixed-width uint8 matrix:
    splitmix-chained uint64 words (blocking key only — collisions are
    caught by the exact verify)."""
    n, w = mat.shape
    pad = (-w) % 8
    if pad:
        mat = np.concatenate(
            [mat, np.zeros((n, pad), dtype=np.uint8)], axis=1)
    words = mat.view(np.uint64)                     # (n, w8)
    h = np.full(n, np.uint64(0x9E3779B97F4A7C15))
    for j in range(words.shape[1]):
        h = splitmix64(h ^ words[:, j])
    return h


def fuzzy_pairs_ed1(ds, id_col: str = "doc_id", str_col: str = "s",
                    width: int = 24, buckets: int | None = None):
    """Edit-distance-<=1 similarity JOIN — every id pair whose strings
    are equal or one substitution / insertion / deletion apart (the
    typo-dedup operator; Levenshtein automata's distributed cousin).
    Deletion-neighborhood blocking (Bocek et al. 2007, "Fast Similarity
    Search in Large Dictionaries"): each string keys on its own hash
    plus the hash of each single-character deletion; any ed<=1 pair
    shares at least one key (equal -> full=full, substitution at p ->
    del_p=del_p, indel -> full=del), so the block join is COMPLETE and
    the exact vectorized verify only prunes.

    Scale shape: variant hashing is numpy column-deletion over the
    padded byte matrix (no per-string Python); candidates explode per
    blocking key inside key-hash bucket groups (triu, in-bucket
    pre-dedup), pairs dedup in ONE pair-key groupby carrying the two
    padded rows; the verify computes same-length Hamming and
    cross-length prefix+suffix spans entirely on (n, width) matrices.
    Strings are caller-bounded to `width` bytes (block keys of longer
    strings truncate-hash; the verify stays exact).

    Returns (id_a, id_b, dist:int64) with id_a < id_b, dist in {0, 1}.
    """
    import ray
    from ray.data.aggregate import Min

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    def keys(batch: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], type=pa.int64()),
                          "id": pa.array([], type=pa.int64()),
                          "pad": pa.array([], type=pa.binary()),
                          "ln": pa.array([], type=pa.int64()),
                          "_b": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        mat, lens = _pad_matrix(batch[str_col], width)
        n = len(lens)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ks, rid = [_rowhash(mat)], [np.arange(n)]
        for j in range(width):                  # deletion variants
            live = lens > j
            if not live.any():
                break
            sub = np.delete(mat[live], j, axis=1)
            ks.append(_rowhash(sub))
            rid.append(np.flatnonzero(live))
        k = np.concatenate(ks).astype(np.int64) & np.int64(2**63 - 1)
        r = np.concatenate(rid)
        pad = pa.Array.from_buffers(
            pa.binary(width), n,
            [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())]) \
            .cast(pa.binary())
        return pa.table({"k": pa.array(k),
                         "id": pa.array(ids[r]),
                         "pad": pad.take(pa.array(r, type=pa.int64())),
                         "ln": pa.array(lens[r]),
                         "_b": pa.array((k % np.int64(buckets))
                                        .astype(np.int32))})

    def cand(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "pa_": pa.array([], type=pa.binary()),
                          "pb_": pa.array([], type=pa.binary()),
                          "la": pa.array([], type=pa.int64()),
                          "lb": pa.array([], type=pa.int64()),
                          "_pb": pa.array([], type=pa.int32())})
        if g.num_rows == 0 or "k" not in g.schema.names:
            return empty
        k = g["k"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        k, ids = k[order], ids[order]
        pad = g["pad"].take(pa.array(order, type=pa.int64()))
        ln = g["ln"].to_numpy(zero_copy_only=False)[order]
        first = np.ones(len(k), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        lens_ = np.diff(np.append(starts, len(k)))
        ia, ib = [], []
        for st, ln_g in zip(starts, lens_):
            if ln_g < 2:
                continue
            iu, ju = np.triu_indices(ln_g, k=1)
            ia.append(st + iu)
            ib.append(st + ju)
        if not ia:
            return empty
        ia, ib = np.concatenate(ia), np.concatenate(ib)
        # same id via distinct variants of one string: drop
        keep = ids[ia] != ids[ib]
        ia, ib = ia[keep], ib[keep]
        swap = ids[ia] > ids[ib]
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        # in-bucket pair pre-dedup
        pk = (ids[ia2] << np.int64(32)) | ids[ib2]
        uk, idx = np.unique(pk, return_index=True)
        ia2, ib2 = ia2[idx], ib2[idx]
        pb = (uk % np.int64(buckets)).astype(np.int32)
        return pa.table({
            "id_a": pa.array(ids[ia2]), "id_b": pa.array(ids[ib2]),
            "pa_": pad.take(pa.array(ia2, type=pa.int64())),
            "pb_": pad.take(pa.array(ib2, type=pa.int64())),
            "la": pa.array(ln[ia2]), "lb": pa.array(ln[ib2]),
            "_pb": pa.array(pb)})

    def verify(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "dist": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "id_a" not in g.schema.names:
            return empty
        ida = g["id_a"].to_numpy(zero_copy_only=False)
        idb = g["id_b"].to_numpy(zero_copy_only=False)
        pk = (ida << np.int64(32)) | idb
        _, idx = np.unique(pk, return_index=True)   # global pair dedup
        take = pa.array(idx, type=pa.int64())
        ida, idb = ida[idx], idb[idx]
        la = g["la"].to_numpy(zero_copy_only=False)[idx]
        lb = g["lb"].to_numpy(zero_copy_only=False)[idx]
        ma = np.frombuffer(
            b"".join(g["pa_"].take(take).to_pylist()),
            dtype=np.uint8).reshape(len(idx), width)
        mb = np.frombuffer(
            b"".join(g["pb_"].take(take).to_pylist()),
            dtype=np.uint8).reshape(len(idx), width)
        cols = np.arange(width)[None, :]
        neq = ma != mb
        dist = np.full(len(idx), 2, dtype=np.int64)
        same = la == lb
        ham = (neq & (cols < la[:, None])).sum(axis=1)
        dist[same & (ham == 0)] = 0
        dist[same & (ham == 1)] = 1
        # cross-length: prefix span + right-aligned suffix span
        cross = np.abs(la - lb) == 1
        if cross.any():
            ci = np.flatnonzero(cross)
            pfx = np.where(neq[ci].any(axis=1),
                           neq[ci].argmax(axis=1), width)
            lo = np.minimum(la[ci], lb[ci])
            # right-align: shift each row so its last char hits width-1
            sha = width - la[ci]
            shb = width - lb[ci]
            ra = np.zeros((len(ci), width), dtype=np.uint8)
            rb = np.zeros((len(ci), width), dtype=np.uint8)
            rows = np.arange(len(ci))[:, None]
            mask_a = cols >= sha[:, None]
            mask_b = cols >= shb[:, None]
            ra[mask_a] = ma[ci][cols < la[ci][:, None]]
            rb[mask_b] = mb[ci][cols < lb[ci][:, None]]
            rneq = (ra != rb)[:, ::-1]
            sfx = np.where(rneq.any(axis=1), rneq.argmax(axis=1), width)
            dist[ci[(pfx + sfx) >= lo]] = 1
        keep = dist <= 1
        return pa.table({"id_a": pa.array(ida[keep]),
                         "id_b": pa.array(idb[keep]),
                         "dist": pa.array(dist[keep])})

    return ds.map_batches(keys, batch_format="pyarrow") \
        .groupby("_b").map_groups(cand, batch_format="pyarrow") \
        .groupby("_pb").map_groups(verify, batch_format="pyarrow")


def _banded_lev(ma: np.ndarray, mb: np.ndarray, la: np.ndarray,
                lb: np.ndarray, k: int) -> np.ndarray:
    """Levenshtein distance per row pair, vectorized ACROSS pairs via
    the Ukkonen band |j - i| <= k: a (n, 2k+1) int16 DP matrix updated
    column-by-column over at most max(la) rows, all char compares
    fixed-column numpy ops over the padded byte matrices. Returns
    int64 distances; -1 where |la - lb| > k (distance certainly > k).
    Band property: the returned value equals the true distance whenever
    that distance is <= k, and exceeds k otherwise — callers filter
    `0 <= dist <= k`. O(max_len * (2k+1)) vector ops total."""
    n = len(la)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return out
    valid = np.abs(la - lb) <= k
    if not valid.any():
        return out
    vi = np.flatnonzero(valid)
    la_, lb_ = la[vi], lb[vi]
    zc = np.zeros((len(vi), k), dtype=np.uint8)  # +k cols: band col
    A = np.concatenate([ma[vi], zc], axis=1)     # reads never go OOB
    Bm = np.concatenate([mb[vi], zc], axis=1)
    B = 2 * k + 1
    INF = np.int16(4096)
    dprev = np.full((len(vi), B), INF, dtype=np.int16)
    for d in range(0, k + 1):                    # row i=0: D[0][j] = j
        dprev[:, d + k] = d
    res = np.full(len(vi), -1, dtype=np.int64)
    z0 = la_ == 0
    res[z0] = lb_[z0]
    for i in range(1, int(la_.max(initial=0)) + 1):
        dcur = np.full((len(vi), B), INF, dtype=np.int16)
        a_ch = A[:, i - 1]
        for o in range(B):
            j = i + o - k
            if j < 0:
                continue
            if j == 0:
                dcur[:, o] = i
                continue
            best = dprev[:, o] + (a_ch != Bm[:, j - 1])       # subst
            if o + 1 < B:
                best = np.minimum(best, dprev[:, o + 1] + 1)  # del
            if o - 1 >= 0:
                best = np.minimum(best, dcur[:, o - 1] + 1)   # ins
            dcur[:, o] = best
        hit = np.flatnonzero(la_ == i)
        if len(hit):
            res[hit] = dcur[hit, lb_[hit] - i + k]
        dprev = dcur
    out[vi] = res
    return out


def _even_segments(L: int, parts: int) -> list[tuple[int, int]]:
    """PassJoin even partition of a length-L string into `parts`
    segments: the first parts-rem get floor(L/parts) chars, the last
    rem get one more. Returns [(start, seg_len), ...]."""
    base, rem = divmod(L, parts)
    out, st = [], 0
    for i in range(parts):
        sl = base + (1 if i >= parts - rem else 0)
        out.append((st, sl))
        st += sl
    return out


def fuzzy_pairs_edk(ds, id_col: str = "doc_id", str_col: str = "s",
                    k: int = 2, width: int = 24,
                    buckets: int | None = None):
    """Edit-distance-<=k similarity JOIN for general k — every id pair
    whose strings are within k Levenshtein edits (the fuzzy-title /
    typo-cluster dedup operator; `fuzzy_pairs_ed1` is the k=1 special
    case with a cheaper blocking scheme).

    Blocking: partition-based segment signatures (PassJoin — Li, Deng,
    Feng, Wang, "PASS-JOIN: A Partition-based Method for Similarity
    Joins", public 2011 algorithm). Every string of length L >= k+1 is
    INDEXED on its k+1 even segments under key (L, slot, seg bytes);
    every string PROBES, for each candidate partner length L' in
    [L-k, L+k] and slot i, its own substrings of the slot's length at
    the slot's start +-k shifts. k edits destroy at most k of the k+1
    segments (pigeonhole) and shift any surviving segment by at most k
    positions, so every qualifying pair shares >= 1 key with the
    shorter side indexed — the block join is COMPLETE and the exact
    verify only prunes. Strings shorter than k+1 chars share one
    constant index key probed by all strings of length <= 2k (any
    partner of a short string is itself short).

    Verify: banded Levenshtein DP vectorized ACROSS pairs — the DP
    band |j - i| <= k is a (n_pairs, 2k+1) int16 matrix updated
    column-by-column over at most `width` rows; all char compares are
    fixed-column numpy ops over the padded byte matrices (no per-pair
    Python). O(width * (2k+1)) vector ops per verify bucket.

    Scale shape mirrors fuzzy_pairs_ed1: key emission is numpy slicing
    over the padded byte matrix inside map_batches; candidates explode
    probe x index per blocking key inside key-hash bucket groups with
    in-bucket pair pre-dedup; ONE pair-key groupby dedups globally and
    verifies. Strings are caller-bounded to `width` bytes. Key count
    per string is O(k^2 * min(2k+1, width)) — keep k small (2-3), as
    the published algorithm does.

    Returns (id_a, id_b, dist:int64) with id_a < id_b, dist <= k.
    Reference analogy: the typo-tolerant tag matching the reference's
    matcher family approximates with explicit alternatives
    (/root/reference/src/command_tags_filter.cpp:95).
    """
    import ray
    from ..functions.hashing import splitmix64 as _sm

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    parts = k + 1
    short_key = np.int64(0x5A17C0DE)  # constant block for len <= k

    def _slice_hash(mat: np.ndarray, rows: np.ndarray, st: int,
                    sl: int, salt: int) -> np.ndarray:
        h = _rowhash(np.ascontiguousarray(mat[rows, st:st + sl]))
        return _sm(h ^ _sm(np.full(len(rows), np.uint64(salt))))

    def keys(batch: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], type=pa.int64()),
                          "id": pa.array([], type=pa.int64()),
                          "role": pa.array([], type=pa.int8()),
                          "pad": pa.array([], type=pa.binary()),
                          "ln": pa.array([], type=pa.int64()),
                          "_b": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        mat, lens = _pad_matrix(batch[str_col], width)
        n = len(lens)
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ks, rid, rol = [], [], []

        def emit(kk: np.ndarray, rows: np.ndarray, role: int) -> None:
            ks.append(kk.astype(np.int64) & np.int64(2**63 - 1))
            rid.append(rows)
            rol.append(np.full(len(rows), role, dtype=np.int8))

        # short-string carve-out (index: len <= k; probe: len <= 2k)
        si = np.flatnonzero(lens <= k)
        if len(si):
            emit(np.full(len(si), short_key, dtype=np.int64), si, 0)
        sp = np.flatnonzero(lens <= 2 * k)
        if len(sp):
            emit(np.full(len(sp), short_key, dtype=np.int64), sp, 1)
        # index: own-length segments (L >= k+1)
        for L in np.unique(lens[lens >= parts]):
            rows = np.flatnonzero(lens == L)
            for i, (st, sl) in enumerate(_even_segments(int(L), parts)):
                emit(_slice_hash(mat, rows, st, sl,
                                 int(L) * 131 + i), rows, 0)
        # probe: partner-length segment windows
        for Lp in range(parts, width + 1):
            near = np.flatnonzero(np.abs(lens - Lp) <= k)
            if not len(near):
                continue
            for i, (st, sl) in enumerate(_even_segments(Lp, parts)):
                for sh in range(-k, k + 1):
                    st2 = st + sh
                    if st2 < 0 or st2 + sl > width:
                        continue
                    rows = near[st2 + sl <= lens[near]]
                    if len(rows):
                        emit(_slice_hash(mat, rows, st2, sl,
                                         Lp * 131 + i), rows, 1)
        if not ks:
            return empty
        kk = np.concatenate(ks)
        r = np.concatenate(rid)
        pad = pa.Array.from_buffers(
            pa.binary(width), n,
            [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())]) \
            .cast(pa.binary())
        return pa.table({"k": pa.array(kk),
                         "id": pa.array(ids[r]),
                         "role": pa.array(np.concatenate(rol)),
                         "pad": pad.take(pa.array(r, type=pa.int64())),
                         "ln": pa.array(lens[r]),
                         "_b": pa.array((kk % np.int64(buckets))
                                        .astype(np.int32))})

    def cand(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "pa_": pa.array([], type=pa.binary()),
                          "pb_": pa.array([], type=pa.binary()),
                          "la": pa.array([], type=pa.int64()),
                          "lb": pa.array([], type=pa.int64()),
                          "_pb": pa.array([], type=pa.int32())})
        if g.num_rows == 0 or "k" not in g.schema.names:
            return empty
        kk = g["k"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        role = g["role"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, role, kk))
        kk, ids, role = kk[order], ids[order], role[order]
        pad = g["pad"].take(pa.array(order, type=pa.int64()))
        ln = g["ln"].to_numpy(zero_copy_only=False)[order]
        first = np.ones(len(kk), dtype=bool)
        first[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(first)
        glens = np.diff(np.append(starts, len(kk)))
        ia, ib = [], []
        for st, gl in zip(starts, glens):
            r = role[st:st + gl]
            nidx = int(np.searchsorted(r, 1))    # roles sorted 0 then 1
            nprb = gl - nidx
            if nidx == 0 or nprb == 0:
                continue
            # dedup repeated (id, role) rows within the key group
            # (one string can probe the same key at several shifts)
            iu = st + np.flatnonzero(np.r_[True, ids[st + 1:st + nidx]
                                           != ids[st:st + nidx - 1]]) \
                if nidx > 1 else np.array([st])
            pu = st + nidx + np.flatnonzero(
                np.r_[True, ids[st + nidx + 1:st + gl]
                      != ids[st + nidx:st + gl - 1]]) \
                if nprb > 1 else np.array([st + nidx])
            ia.append(np.repeat(iu, len(pu)))
            ib.append(np.tile(pu, len(iu)))
        if not ia:
            return empty
        ia, ib = np.concatenate(ia), np.concatenate(ib)
        keep = ids[ia] != ids[ib]
        ia, ib = ia[keep], ib[keep]
        if not len(ia):
            return empty
        swap = ids[ia] > ids[ib]
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        pk = (ids[ia2] << np.int64(32)) | ids[ib2]
        uk, idx = np.unique(pk, return_index=True)
        ia2, ib2 = ia2[idx], ib2[idx]
        pb = (uk % np.int64(buckets)).astype(np.int32)
        return pa.table({
            "id_a": pa.array(ids[ia2]), "id_b": pa.array(ids[ib2]),
            "pa_": pad.take(pa.array(ia2, type=pa.int64())),
            "pb_": pad.take(pa.array(ib2, type=pa.int64())),
            "la": pa.array(ln[ia2]), "lb": pa.array(ln[ib2]),
            "_pb": pa.array(pb)})

    def verify(g: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "dist": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "id_a" not in g.schema.names:
            return empty
        ida = g["id_a"].to_numpy(zero_copy_only=False)
        idb = g["id_b"].to_numpy(zero_copy_only=False)
        pk = (ida << np.int64(32)) | idb
        _, idx = np.unique(pk, return_index=True)   # global pair dedup
        la = g["la"].to_numpy(zero_copy_only=False)[idx]
        lb = g["lb"].to_numpy(zero_copy_only=False)[idx]
        lok = np.abs(la - lb) <= k                  # length filter
        idx = idx[lok]
        if not len(idx):
            return empty
        ida, idb = ida[idx], idb[idx]
        la, lb = la[lok], lb[lok]
        take = pa.array(idx, type=pa.int64())
        n = len(idx)
        zc = np.zeros((n, k), dtype=np.uint8)       # +k cols so the
        ma = np.concatenate([np.frombuffer(                 # band never
            b"".join(g["pa_"].take(take).to_pylist()),      # reads OOB
            dtype=np.uint8).reshape(n, width), zc], axis=1)
        mb = np.concatenate([np.frombuffer(
            b"".join(g["pb_"].take(take).to_pylist()),
            dtype=np.uint8).reshape(n, width), zc], axis=1)
        B = 2 * k + 1
        INF = np.int16(4096)
        dprev = np.full((n, B), INF, dtype=np.int16)
        for d in range(0, k + 1):                   # row i=0: D[0][j]=j
            dprev[:, d + k] = d
        res = np.full(n, -1, dtype=np.int64)
        z0 = la == 0
        res[z0] = lb[z0]
        for i in range(1, int(la.max(initial=0)) + 1):
            dcur = np.full((n, B), INF, dtype=np.int16)
            a_ch = ma[:, i - 1]
            for o in range(B):
                j = i + o - k
                if j < 0:
                    continue
                if j == 0:
                    dcur[:, o] = i
                    continue
                best = dprev[:, o] + (a_ch != mb[:, j - 1])  # subst
                if o + 1 < B:
                    best = np.minimum(best, dprev[:, o + 1] + 1)  # del
                if o - 1 >= 0:
                    best = np.minimum(best, dcur[:, o - 1] + 1)   # ins
                dcur[:, o] = best
            hit = np.flatnonzero(la == i)
            if len(hit):
                res[hit] = dcur[hit, lb[hit] - i + k]
            dprev = dcur
        keep = (res >= 0) & (res <= k)
        return pa.table({"id_a": pa.array(ida[keep]),
                         "id_b": pa.array(idb[keep]),
                         "dist": pa.array(res[keep])})

    return ds.map_batches(keys, batch_format="pyarrow") \
        .groupby("_b").map_groups(cand, batch_format="pyarrow") \
        .groupby("_pb").map_groups(verify, batch_format="pyarrow")


def _unpack_u64_sets(payloads: list) -> list[np.ndarray]:
    """Inverse of key_token_sets' packing: binary -> sorted uint64 set."""
    return [np.frombuffer(b, dtype=np.uint64) if b else
            np.empty(0, np.uint64) for b in payloads]


def key_token_sets(rows, key_col: str, token_col: str,
                   buckets: int | None = None, packed_col: str = "_packed"):
    """Collapse flat (key, token) rows into one row per key carrying the
    key's SORTED UNIQUE uint64 token set packed as binary (Acero rejects
    list<T> payloads in joins — project hard rule — and binary survives every
    shuffle). One hash(key)%buckets shuffle; inside a bucket one lexsort
    + run-length slice per key (memcpy-only Python)."""
    import ray

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    s = rows.schema()
    key_type = dict(zip(s.names, s.types))[key_col]

    def add_b(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col, token_col])
        k = t[key_col]
        if pa.types.is_integer(k.type):
            b = (k.to_numpy(zero_copy_only=False).astype(np.uint64)
                 % np.uint64(buckets)).astype(np.int32)
        else:
            b = (hash_str_u64(k) % np.uint64(buckets)).astype(np.int32)
        return t.append_column("_b", pa.array(b))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], type=key_type),
                          packed_col: pa.array([], type=pa.binary())})
        if g.num_rows == 0 or key_col not in g.schema.names:
            return empty
        keys = np.asarray(g[key_col].to_pylist())
        tok = g[token_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        o = np.lexsort((tok, keys))
        keys, tok = keys[o], tok[o]
        first = np.ones(len(keys), dtype=bool)
        first[1:] = (keys[1:] != keys[:-1]) | (tok[1:] != tok[:-1])
        keys, tok = keys[first], tok[first]
        newk = np.ones(len(keys), dtype=bool)
        newk[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(newk)
        ends = np.append(starts[1:], len(keys))
        packed = [tok[s0:e0].tobytes() for s0, e0 in zip(starts, ends)]
        return pa.table({key_col: pa.array(keys[starts].tolist(),
                                           type=key_type),
                         packed_col: pa.array(packed, type=pa.binary())})

    return rows.map_batches(add_b, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


def set_jaccard_join(rows, key_col: str, token_col: str,
                     threshold: float = 0.5, coarse: int | None = None,
                     df_broadcast_cap: int = 4_000_000):
    """EXACT Jaccard join over arbitrary per-key token SETS given as
    flat (key, token:int64) rows — jaccard_join's prefix-filter pipeline
    with the token universe swapped from text shingles to the packed
    per-key sets (e.g. users by visited grid cells, items by feature
    ids). Returns (a, b, inter_sz, union_sz, jacc)."""
    # one row per key after the fold — materialize so jaccard_join's
    # three consumers (df pass, prefix pass, payload attach) don't each
    # re-execute the whole collapse (the >1-consumer re-execution rule)
    sets_ds = key_token_sets(rows, key_col, token_col).materialize()
    return jaccard_join(sets_ds, text_col="_packed", id_col=key_col,
                        threshold=threshold, coarse=coarse,
                        df_broadcast_cap=df_broadcast_cap,
                        sets_fn=_unpack_u64_sets)


def fuzzy_contamination(docs, bench, threshold: float = 0.5, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id"):
    """NEAR-DUP benchmark decontamination: flag corpus documents whose
    word-n-gram SET Jaccard against ANY benchmark document reaches
    `threshold`, reporting each flagged doc's best match — the fuzzy
    companion of contamination_check (which needs one shared n-gram;
    this needs overall similarity, catching lightly-edited eval leaks
    that share no long window verbatim is the n<=3 regime).

    Scale shape: the benchmark folds to the driver ONCE (eval suites
    are small by definition — contamination_check's declared seam) as a
    flat token-sorted (token, owner) array + per-bench sizes, broadcast
    via ray.put; each corpus batch then computes ALL (doc x bench)
    intersection counts in one searchsorted + range-expand + bincount
    pass — no shuffle, exact, O(batch tokens x avg bench hits).

    Returns (id_col, bench_id, inter_sz, union_sz, jacc) for flagged
    docs only; best match breaks jacc ties to the smallest bench id."""
    import ray

    rows = bench.select_columns([id_col, text_col]).take_all()
    bids = np.asarray([r[id_col] for r in rows])
    border = np.argsort(bids, kind="stable")       # id-ascending ties
    bids = bids[border]
    bsets = [s for s in np.asarray(
        _word_ngram_sets([rows[i][text_col] for i in border], n),
        dtype=object)]
    bsize = np.asarray([s.size for s in bsets], dtype=np.int64)
    flat_b = np.concatenate(bsets) if bsets else np.empty(0, np.uint64)
    own_b = np.repeat(np.arange(len(bsets), dtype=np.int64), bsize)
    o = np.argsort(flat_b, kind="stable")
    ref = ray.put((flat_b[o], own_b[o], bids, bsize))

    s = docs.schema()
    id_type = dict(zip(s.names, s.types))[id_col]
    empty = pa.table({id_col: pa.array([], type=id_type),
                      "bench_id": pa.array([], type=bids.dtype == object
                                           and pa.string() or pa.int64()),
                      "inter_sz": pa.array([], type=pa.int64()),
                      "union_sz": pa.array([], type=pa.int64()),
                      "jacc": pa.array([], type=pa.float64())})

    def score(batch: pa.Table) -> pa.Table:
        btok, bown, bid, bsz = ray.get(ref)
        nb = len(bid)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col]
        sets = _word_ngram_sets(texts, n)
        nd = len(sets)
        if nd == 0 or nb == 0:
            return empty
        dsize = np.asarray([s_.size for s_ in sets], dtype=np.int64)
        flat = np.concatenate(sets)
        didx = np.repeat(np.arange(nd, dtype=np.int64), dsize)
        lo = np.searchsorted(btok, flat, side="left")
        hi = np.searchsorted(btok, flat, side="right")
        m = hi - lo
        tot = int(m.sum())
        if tot == 0:
            return empty
        rowi = np.repeat(np.arange(len(flat), dtype=np.int64), m)
        ends = np.cumsum(m)
        pos = np.arange(tot, dtype=np.int64) - np.repeat(ends - m, m) \
            + lo[rowi]
        key = didx[rowi] * nb + bown[pos]
        inter = np.bincount(key, minlength=nd * nb).reshape(nd, nb) \
            .astype(np.int64)
        union = dsize[:, None] + bsz[None, :] - inter
        jacc = inter / np.maximum(union, 1)
        best = np.argmax(jacc, axis=1)      # first max = smallest bench id
        bj = jacc[np.arange(nd), best]
        keep = bj >= threshold
        if not keep.any():
            return empty
        ki = np.flatnonzero(keep)
        return pa.table({
            id_col: ids.take(pa.array(ki)),
            "bench_id": pa.array(bid[best[ki]].tolist()),
            "inter_sz": pa.array(inter[ki, best[ki]]),
            "union_sz": pa.array(union[ki, best[ki]]),
            "jacc": pa.array(bj[ki])})

    return docs.map_batches(score, batch_format="pyarrow")
