"""Iterative graph algorithms over edge tables — PageRank as the
representative distributed power iteration (the class of ops the brief
calls 'iterative algorithms'; the engine's other graph op is
connected_components, stages/dedup.py).

Scale shape per iteration: the rank vector is NODE STATE broadcast once
via ray.put (int-keyed dense arrays — bytes per node); each edge batch
computes its contribution partials with one bincount (no per-edge
Python), a native groupby folds them per destination, and the driver
updates the (small) state vector. One shuffle of pre-reduced (dst, sum)
partials per iteration. For node counts beyond driver RAM, swap the
broadcast state for a bucketed rank join (idops.semi_join_bucketed) —
the edge-side pass is unchanged.

No SQL oracle: iterative float fixpoints are in the rows-only class
(like ivf_ann); pytest pins the result against a dense numpy power
iteration to 1e-12.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pagerank(edges, n_nodes: int, src_col: str = "src",
             dst_col: str = "dst", n_iters: int = 10,
             damping: float = 0.85):
    """PageRank over an integer-keyed edge Dataset (nodes 0..n_nodes-1).
    Dangling nodes (out-degree 0) redistribute uniformly, the standard
    formulation. Returns a pyarrow Table (node:int64, rank:float64)."""
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
