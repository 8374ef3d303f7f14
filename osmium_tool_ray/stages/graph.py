"""Iterative graph algorithms over edge tables — PageRank as the
representative distributed power iteration (the class of ops the brief
calls 'iterative algorithms'; the engine's other graph op is
connected_components, stages/dedup.py).

Two rank-state layouts behind one entry point (`pagerank`):

  * dense driver vector (n_nodes <= driver_cap): the rank vector is
    NODE STATE broadcast once via ray.put (int-keyed dense arrays —
    bytes per node); each edge batch computes its contribution partials
    with one bincount, a native groupby folds them per destination, and
    the driver updates the vector. One shuffle of pre-reduced
    (dst, sum) partials per iteration — the fast exact path while the
    vector fits driver RAM.
  * Dataset rank state (`pagerank_distributed`, auto past driver_cap):
    ranks live as a (node, rank, deg) Dataset; each iteration
    co-locates edges with their source ranks by node-hash bucket (the
    semi_join_bucketed union shape), pre-folds contributions per dst
    inside the bucket, Sums them natively, and rebuilds the rank table
    with a node-universe union + one groupby — the only driver state is
    two scalars (dangling mass, iteration counter). 100-TB-graph safe.

No SQL oracle: iterative float fixpoints are in the rows-only class
(like ivf_ann); pytest pins the driver path against a dense numpy power
iteration to 1e-12 and the distributed path to 1e-9 (summation order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pagerank(edges, n_nodes: int, src_col: str = "src",
             dst_col: str = "dst", n_iters: int = 10,
             damping: float = 0.85, driver_cap: int = 5_000_000):
    """PageRank over an integer-keyed edge Dataset (nodes 0..n_nodes-1).
    Dangling nodes (out-degree 0) redistribute uniformly, the standard
    formulation. Returns a pyarrow Table (node:int64, rank:float64).
    Past `driver_cap` nodes the rank vector no longer fits driver RAM
    and the Dataset-state path takes over."""
    if n_nodes > driver_cap:
        return pagerank_distributed(edges, n_nodes, src_col=src_col,
                                    dst_col=dst_col, n_iters=n_iters,
                                    damping=damping)
    import ray
    from ray.data.aggregate import Sum

    edges = edges.select_columns([src_col, dst_col]).materialize()

    # out-degrees: one narrow groupby, folded into a dense vector
    deg = np.zeros(n_nodes, dtype=np.int64)
    for r in edges.groupby(src_col).count().take_all():
        deg[int(r[src_col])] = int(r["count()"])

    ranks = np.full(n_nodes, 1.0 / n_nodes, dtype=np.float64)
    safe_deg = np.maximum(deg, 1)

    for _ in range(n_iters):
        contrib = ranks / safe_deg
        cref = ray.put(contrib)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            s = batch[src_col].to_numpy(zero_copy_only=False)
            d = batch[dst_col].to_numpy(zero_copy_only=False)
            sums = np.bincount(d, weights=c[s], minlength=0)
            nz = np.flatnonzero(sums)
            return pa.table({"dst": pa.array(nz.astype(np.int64)),
                             "s": pa.array(sums[nz])})

        acc = np.zeros(n_nodes, dtype=np.float64)
        folded = edges.map_batches(partial, batch_format="pyarrow") \
            .groupby("dst").aggregate(Sum("s", alias_name="s")).take_all()
        for r in folded:
            acc[int(r["dst"])] = float(r["s"])
        dangling = ranks[deg == 0].sum()
        ranks = ((1.0 - damping) / n_nodes
                 + damping * (acc + dangling / n_nodes))

    return pa.table({"node": pa.array(np.arange(n_nodes, dtype=np.int64)),
                     "rank": pa.array(ranks)})


def pagerank_distributed(edges, n_nodes: int, src_col: str = "src",
                         dst_col: str = "dst", n_iters: int = 10,
                         damping: float = 0.85, buckets: int = 64):
    """PageRank with the rank vector as a DATASET — no O(nodes) driver
    state (the scale path behind `pagerank`).

    Per iteration (2 narrow shuffles, scalars only on the driver):
      1. contribution join: edges (bucketed once by hash(src),
         materialized) union current ranks (bucketed by hash(node));
         per bucket a searchsorted src->rank/deg lookup + per-dst
         pre-fold emits (node, s, deg=0) partials — the
         semi_join_bucketed union shape, pipelines/idops.py:367.
      2. node fold: static (node, s=0, deg) universe rows union the
         contribution partials; ONE groupby(node) {Sum(s), Max(deg)}
         (Sum is associative, so no intermediate acc fold) + one map
         rebuilds (node, rank, deg). Dangling mass is one scalar
         Dataset.sum over the already-materialized ranks.
    Ranks materialize each iteration (they are consumed twice and Ray
    Datasets re-execute lineage on reuse)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from ..functions.hashing import splitmix64

    def _bucket_of(node_arr: np.ndarray) -> np.ndarray:
        return (splitmix64(node_arr.astype(np.uint64))
                % np.uint64(buckets)).astype(np.int32)

    # static: edges bucketed by src hash, materialized once
    def tag_edge(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(s), "dst": pa.array(d),
                         "rank": pa.array(np.full(len(s), np.nan)),
                         "deg": pa.array(np.full(len(s), -1,
                                                 dtype=np.int64)),
                         "_b": pa.array(_bucket_of(s)),
                         "_side": pa.array(np.zeros(len(s),
                                                    dtype=np.int8))})

    edges_tagged = edges.select_columns([src_col, dst_col]) \
        .map_batches(tag_edge, batch_format="pyarrow").materialize()

    # static: out-degrees as a Dataset (node universe 0..n_nodes-1)
    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "s": pa.array(c.astype(np.float64))})

    universe = rd.range(n_nodes).map_batches(
        lambda b: pa.table({"node": b["id"].cast(pa.int64()),
                            "s": pa.array(np.zeros(b.num_rows))}),
        batch_format="pyarrow")
    degs = edges.select_columns([src_col]) \
        .map_batches(deg_partial, batch_format="pyarrow") \
        .union(universe).groupby("node") \
        .aggregate(Sum("s", alias_name="deg_f"))

    r0 = 1.0 / n_nodes

    def init_rank(batch: pa.Table) -> pa.Table:
        d = batch["deg_f"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.num_rows
        return pa.table({"node": batch["node"].cast(pa.int64()),
                         "rank": pa.array(np.full(n, r0)),
                         "deg": pa.array(d)})

    _rank_blocks = max(2, min(buckets, 16))
    ranks = degs.map_batches(init_rank, batch_format="pyarrow") \
        .repartition(_rank_blocks).materialize()

    def tag_rank(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": batch["node"].cast(pa.int64()),
                         "dst": pa.array(np.full(len(node), -1,
                                                 dtype=np.int64)),
                         "rank": batch["rank"],
                         "deg": batch["deg"].cast(pa.int64()),
                         "_b": pa.array(_bucket_of(node)),
                         "_side": pa.array(np.ones(len(node),
                                                   dtype=np.int8))})

    def contrib_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        node = g["node"].to_numpy(zero_copy_only=False)
        rmask = side == 1
        rn = node[rmask]
        rr = g["rank"].to_numpy(zero_copy_only=False)[rmask]
        rdeg = g["deg"].to_numpy(zero_copy_only=False)[rmask]
        o = np.argsort(rn, kind="stable")
        rn, rc = rn[o], (rr / np.maximum(rdeg, 1))[o]
        emask = ~rmask
        if not emask.any() or not len(rn):
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "deg": pa.array([], type=pa.int64())})
        src = node[emask]
        dst = g["dst"].to_numpy(zero_copy_only=False)[emask]
        pos = np.searchsorted(rn, src)  # every src exists in the universe
        c = rc[pos]
        ud, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=c)
        return pa.table({"node": pa.array(ud.astype(np.int64)),
                         "s": pa.array(sums),
                         "deg": pa.array(np.zeros(len(ud),
                                                  dtype=np.int64))})

    def finish_factory(dangling: float):
        def finish(batch: pa.Table) -> pa.Table:
            s = batch["s"].to_numpy(zero_copy_only=False)
            new_rank = (1.0 - damping) / n_nodes \
                + damping * (s + dangling / n_nodes)
            return pa.table({"node": batch["node"].cast(pa.int64()),
                             "rank": pa.array(new_rank),
                             "deg": batch["deg"].cast(pa.int64())})
        return finish

    def dang_partial(batch: pa.Table) -> pa.Table:
        r = batch["rank"].to_numpy(zero_copy_only=False)
        d = batch["deg"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array([float(r[d == 0].sum())])})

    def rank_universe(batch: pa.Table) -> pa.Table:
        # (node, deg, s=0) carrier rows: keep every node in the fold and
        # carry deg through Max (acc rows carry deg=0; deg >= 0 always)
        return pa.table({"node": batch["node"].cast(pa.int64()),
                         "s": pa.array(np.zeros(batch.num_rows)),
                         "deg": batch["deg"].cast(pa.int64())})

    for _ in range(n_iters):
        dangling = ranks.map_batches(
            dang_partial, batch_format="pyarrow").sum("x") or 0.0
        tagged = edges_tagged.union(
            ranks.map_batches(tag_rank, batch_format="pyarrow"))
        contrib = tagged.groupby("_b") \
            .map_groups(contrib_bucket, batch_format="pyarrow")
        folded = ranks.map_batches(rank_universe, batch_format="pyarrow") \
            .union(contrib).groupby("node") \
            .aggregate(Sum("s", alias_name="s"), Max("deg", alias_name="deg"))
        # pin the rank table's block count: groupby output fans out into
        # many small blocks, and letting them accumulate makes every later
        # union/groupby pay per-block overhead that grows per iteration
        # (the stages/dedup pinned-block-count pattern)
        ranks = folded.map_batches(finish_factory(dangling),
                                   batch_format="pyarrow") \
            .repartition(_rank_blocks).materialize()

    out = ranks.select_columns(["node", "rank"]).sort("node").take_all()
    return pa.table({"node": pa.array([r["node"] for r in out],
                                      type=pa.int64()),
                     "rank": pa.array([r["rank"] for r in out])})
