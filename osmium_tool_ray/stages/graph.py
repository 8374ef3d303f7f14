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
import pyarrow.compute as pc


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


def _canon_deg_oriented(edges, a_col: str, b_col: str, buckets: int,
                        deg_cap: int):
    """Shared triangle-family front end: canonicalize to distinct
    undirected (lo, hi) edges, fold the degree Dataset, and orient each
    edge from its (degree, id)-smaller endpoint (compact-forward rule —
    bounds every node's oriented out-degree by O(sqrt(m))). Degrees
    broadcast under `deg_cap`, else attach through node-hash bucketed
    union joins (blocks.attach_lookup_bucketed) so the degree table
    never leaves the object store. Returns (dedup_edges, deg_ds,
    oriented) — oriented has (src, dst, _sb=src%buckets)."""
    import ray
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        key = np.unique((lo[keep] << np.int64(32)) | hi[keep])
        return pa.table({"lo": pa.array(key >> np.int64(32)),
                         "hi": pa.array(key & np.int64(0xFFFFFFFF)),
                         "_c": pa.array(np.ones(len(key), np.int64))})

    # global distinct edges: one groupby on the packed key via (lo, hi)
    dedup = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["lo", "hi"]).aggregate(Sum("_c", alias_name="_c")) \
        .select_columns(["lo", "hi"]).materialize()

    # degree fold (each distinct edge contributes 1 to both endpoints)
    def deg_partial(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([lo, hi])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "d": pa.array(c.astype(np.int64))})

    deg_ds = dedup.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("d", alias_name="d")) \
        .materialize()

    def _orient_arrays(lo, hi, dlo, dhi):
        # orient from (deg, id)-smaller -> larger
        fwd = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        src = np.where(fwd, lo, hi)
        dst = np.where(fwd, hi, lo)
        sb = (src % np.int64(buckets)).astype(np.int32)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "_sb": pa.array(sb)})

    if deg_ds.count() <= deg_cap:
        from ..blocks import bounded_rows
        deg_rows = bounded_rows(deg_ds, deg_cap, "degree broadcast fold")
        dnodes = np.asarray([r["node"] for r in deg_rows],
                            dtype=np.int64)
        dvals = np.asarray([r["d"] for r in deg_rows], dtype=np.int64)
        order = np.argsort(dnodes)
        dref = ray.put((dnodes[order], dvals[order]))

        def orient_bucket(batch: pa.Table) -> pa.Table:
            dn, dv = ray.get(dref)
            lo = batch["lo"].to_numpy(zero_copy_only=False)
            hi = batch["hi"].to_numpy(zero_copy_only=False)
            return _orient_arrays(lo, hi, dv[np.searchsorted(dn, lo)],
                                  dv[np.searchsorted(dn, hi)])

        oriented = dedup.map_batches(orient_bucket,
                                     batch_format="pyarrow")
    else:
        # scale path: the degree table never leaves the object store —
        # two node-hash-bucketed union joins attach each endpoint's
        # degree (blocks.attach_lookup_bucketed), then orientation is a
        # stateless map
        from ..blocks import attach_lookup_bucketed

        with_dlo = attach_lookup_bucketed(dedup, deg_ds, "lo", "d",
                                          "_dlo", lookup_key="node",
                                          buckets=buckets)
        with_deg = attach_lookup_bucketed(with_dlo, deg_ds, "hi", "d",
                                          "_dhi", lookup_key="node",
                                          buckets=buckets)

        def orient_joined(batch: pa.Table) -> pa.Table:
            lo = batch["lo"].to_numpy(zero_copy_only=False)
            hi = batch["hi"].to_numpy(zero_copy_only=False)
            dlo = batch["_dlo"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dhi = batch["_dhi"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return _orient_arrays(lo, hi, dlo, dhi)

        oriented = with_deg.map_batches(orient_joined,
                                        batch_format="pyarrow")
    return dedup, deg_ds, oriented


def triangle_count(edges, a_col: str = "a", b_col: str = "b",
                   buckets: int | None = None, deg_cap: int = 50_000_000):
    """Distributed triangle counting — wedge generation + edge
    membership join (the compact-forward / node-iterator algorithm,
    Latapy 2008). Edges are first canonicalized (undirected, distinct,
    self-loops dropped), then ORIENTED from the (degree, id)-smaller to
    the larger endpoint: every triangle forms exactly one wedge at its
    smallest-degree corner, and each node's oriented out-degree is
    O(sqrt(m)), which bounds the wedge explosion even on power-law hubs
    (the hot-key guard — a raw adjacency explode at a celebrity node is
    quadratic; the oriented one is not).

    Shapes: ONE groupby(src) builds oriented adjacency and explodes
    wedges (v, w) in-group (vectorized triu indexing); the wedge->edge
    membership test is a bucketed sorted-array probe — wedges and edges
    hash-partition by the packed (v, w) key into the same buckets, so
    each group does ONE searchsorted, no driver set. Degrees fold
    through a native Sum and broadcast under `deg_cap`; past the cap
    the degree table stays a DATASET and each endpoint's degree
    attaches through a node-hash bucketed union join
    (blocks.attach_lookup_bucketed) — identical results, pinned by a
    forced-cap pytest.

    Returns a 1-row (n_triangles:int64) table."""
    import ray
    from ray.data.aggregate import Sum

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    dedup, deg_ds, oriented = _canon_deg_oriented(
        edges, a_col, b_col, buckets, deg_cap)

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table({"v": pa.array([], type=pa.int64()),
                          "w": pa.array([], type=pa.int64()),
                          "_b": pa.array([], type=pa.int32()),
                          "_e": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "src" not in g.schema.names:
            return empty
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        first = np.ones(len(s), dtype=bool)
        first[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(s)))
        vs, ws = [], []
        for st, ln in zip(starts, lens):       # per-node triu explode
            if ln < 2:
                continue
            adj = d[st:st + ln]
            iu, ju = np.triu_indices(ln, k=1)
            vs.append(adj[iu])
            ws.append(adj[ju])
        if not vs:
            return empty
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        vv, ww = np.minimum(v, w), np.maximum(v, w)
        b = (((vv << np.int64(32)) | ww)
             % np.int64(buckets)).astype(np.int32)
        return pa.table({"v": pa.array(vv), "w": pa.array(ww),
                         "_b": pa.array(b),
                         "_e": pa.array(np.zeros(len(vv), np.int64))})

    def edge_keyed(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        key = (lo << np.int64(32)) | hi
        b = (key % np.int64(buckets)).astype(np.int32)
        return pa.table({"v": pa.array(lo), "w": pa.array(hi),
                         "_b": pa.array(b),
                         "_e": pa.array(np.ones(len(lo), np.int64))})

    wedge_ds = oriented.groupby("_sb").map_groups(
        wedges, batch_format="pyarrow")
    edge_ds = dedup.map_batches(edge_keyed, batch_format="pyarrow")

    def probe(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "v" not in g.schema.names:
            return pa.table({"n": pa.array([], type=pa.int64())})
        is_edge = g["_e"].to_numpy(zero_copy_only=False) == 1
        key = ((g["v"].to_numpy(zero_copy_only=False) << np.int64(32))
               | g["w"].to_numpy(zero_copy_only=False))
        ek = np.sort(key[is_edge])
        wk = key[~is_edge]
        if not len(ek) or not len(wk):
            return pa.table({"n": pa.array([0], type=pa.int64())})
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
        return pa.table({"n": pa.array([int(hit.sum())],
                                       type=pa.int64())})

    both = wedge_ds.union(edge_ds)
    parts = both.groupby("_b").map_groups(probe, batch_format="pyarrow") \
        .take_all()
    total = int(sum(r["n"] for r in parts))
    return pa.table({"n_triangles": pa.array([total], type=pa.int64())})


def k_core(edges, k: int, a_col: str = "a", b_col: str = "b",
           max_iters: int = 60, partitions: int | None = None):
    """k-core decomposition (membership for a fixed k): iteratively peel
    nodes of degree < k from the undirected distinct edge set until a
    fixpoint — the density-subgraph / community-seed operator
    (Seidman 1983). Rows-only: the peel is iterative.

    Scale shape per iteration: per-batch endpoint-count pre-agg -> one
    native Sum groupby for degrees; the alive-node set stays a DATASET
    and edges are filtered by TWO bucketed anti-probes (the
    idops.semi_join_bucketed pattern) — no driver materialization of
    nodes or edges. Each round's edge set is materialized pinned to a
    fixed partition count (the iterative-pipeline block-growth
    landmine); rounds are O(peel depth) <= max_iters.

    Returns (node:int64, degree:int64) for nodes in the k-core."""
    import ray
    from ray.data.aggregate import Sum

    if partitions is None:
        partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def degrees(es):
        def partial(batch: pa.Table) -> pa.Table:
            a = batch[a_col].to_numpy(zero_copy_only=False)
            b = batch[b_col].to_numpy(zero_copy_only=False)
            u, c = np.unique(np.concatenate([a, b]), return_counts=True)
            return pa.table({"node": pa.array(u.astype(np.int64)),
                             "_d": pa.array(c.astype(np.int64))})
        return es.map_batches(partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("_d", alias_name="degree"))

    def filter_edges(es, low_ds):
        """Drop edges touching any low-degree node: two bucketed
        sorted-probe passes (edges bucket on the probed endpoint)."""
        def probe(col):
            def add_b(batch: pa.Table) -> pa.Table:
                v = batch[col].to_numpy(zero_copy_only=False) \
                    if col in batch.schema.names else \
                    batch["node"].to_numpy(zero_copy_only=False)
                b = (v.astype(np.uint64) % np.uint64(64)).astype(np.int32)
                return batch.append_column("_b", pa.array(b))

            def per_bucket(g: pa.Table) -> pa.Table:
                empty = pa.table({a_col: pa.array([], type=pa.int64()),
                                  b_col: pa.array([], type=pa.int64())})
                if g.num_rows == 0:
                    return empty
                names = g.schema.names
                if "node" in names and a_col in names:
                    is_low = pc.is_valid(g["node"])
                    low = np.sort(g.filter(is_low)["node"]
                                  .to_numpy(zero_copy_only=False))
                    eg = g.filter(pc.invert(is_low))
                elif "node" in names:
                    return empty
                else:
                    low = np.array([], dtype=np.int64)
                    eg = g
                if eg.num_rows == 0:
                    return empty
                v = eg[col].to_numpy(zero_copy_only=False)
                if len(low):
                    pos = np.searchsorted(low, v)
                    pos_c = np.minimum(pos, len(low) - 1)
                    keep = ~((pos < len(low)) & (low[pos_c] == v))
                else:
                    keep = np.ones(len(v), dtype=bool)
                return pa.table({a_col: eg[a_col].filter(pa.array(keep)),
                                 b_col: eg[b_col].filter(pa.array(keep))})

            lows = low_ds.map_batches(
                lambda t: pa.table({"node": t["node"].cast(pa.int64())}),
                batch_format="pyarrow")
            edges_side = es.select_columns([a_col, b_col])
            return edges_side.map_batches(add_b, batch_format="pyarrow") \
                .union(lows.map_batches(add_b, batch_format="pyarrow")) \
                .groupby("_b").map_groups(per_bucket,
                                          batch_format="pyarrow")

        return probe

    es = edges.select_columns([a_col, b_col]) \
        .repartition(partitions).materialize()
    n_edges = es.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        deg = degrees(es)
        low = deg.filter(expr=f"degree < {k}").materialize()
        if low.count() == 0:
            break
        es = filter_edges(es, low)(a_col)
        es = filter_edges(es, low)(b_col) \
            .repartition(partitions).materialize()
        n_new = es.count()
        if n_new == n_edges:
            break
        n_edges = n_new
    return degrees(es)


def common_neighbors(edges, a_col: str = "a", b_col: str = "b",
                     max_center_degree: int = 2_000,
                     buckets: int | None = None,
                     deg_cap: int = 50_000_000):
    """Link-prediction scores — common-neighbor counts and Jaccard
    similarity for every node pair sharing >= 1 neighbor (Liben-Nowell &
    Kleinberg 2003). The wedge dual of triangle_count: a pair (x, y)
    has one wedge per common neighbor, so pair counts are wedge counts
    grouped by endpoint pair.

    Hot-node guard: wedge emission at a center is O(deg^2), and unlike
    triangle counting it CANNOT be oriented away (every common neighbor
    must be witnessed), so centers with degree > `max_center_degree` are
    EXCLUDED from wedge generation — the standard practice (super-hubs
    carry no link-prediction signal and dominate the blowup). The cutoff
    is part of the operator's declared semantics and is mirrored in the
    SQL oracle; at a cap above the true max degree the result is exact.

    Shapes: distinct undirected edges (one groupby), native-Sum degree
    fold broadcast under `deg_cap` (past the cap the degree table stays
    a Dataset and attaches via node-hash bucketed union joins —
    blocks.attach_lookup_bucketed, forced-cap pytest-pinned), per-center triu explode
    inside center-hash bucket groups with in-group pair pre-aggregation,
    then ONE pair-hash bucket shuffle sums partials and attaches degrees
    for the Jaccard = common / (deg_x + deg_y - common).

    Returns (node_a, node_b, n_common:int64, jaccard:float64),
    node_a < node_b. Reference analogy: getparents' reverse-member
    expansion (src/command_getparents.cpp) is the same
    neighbor-of-neighbor shape without the pair aggregation."""
    import ray
    from ray.data.aggregate import Sum

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        key = np.unique((lo[keep] << np.int64(32)) | hi[keep])
        return pa.table({"lo": pa.array(key >> np.int64(32)),
                         "hi": pa.array(key & np.int64(0xFFFFFFFF)),
                         "_c": pa.array(np.ones(len(key), np.int64))})

    dedup = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["lo", "hi"]).aggregate(Sum("_c", alias_name="_c")) \
        .select_columns(["lo", "hi"]).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        u, c = np.unique(np.concatenate([lo, hi]), return_counts=True)
        return pa.table({"node": pa.array(u),
                         "d": pa.array(c.astype(np.int64))})

    deg_ds = dedup.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("d", alias_name="d")) \
        .materialize()
    broadcast_deg = deg_ds.count() <= deg_cap
    if broadcast_deg:
        deg_rows = deg_ds.take_all()
        dnodes = np.asarray([r["node"] for r in deg_rows],
                            dtype=np.int64)
        dvals = np.asarray([r["d"] for r in deg_rows], dtype=np.int64)
        order = np.argsort(dnodes)
        dref = ray.put((dnodes[order], dvals[order]))

    def doubled(batch: pa.Table) -> pa.Table:
        """Each distinct edge witnessed from both endpoints as center,
        centers above the degree cap dropped map-side."""
        dn, dv = ray.get(dref)
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        ctr = np.concatenate([lo, hi])
        nbr = np.concatenate([hi, lo])
        keep = dv[np.searchsorted(dn, ctr)] <= max_center_degree
        ctr, nbr = ctr[keep], nbr[keep]
        cb = (ctr % np.int64(buckets)).astype(np.int32)
        return pa.table({"ctr": pa.array(ctr), "nbr": pa.array(nbr),
                         "_cb": pa.array(cb)})

    def wedge_pairs(g: pa.Table) -> pa.Table:
        """Per-center triu explode + in-group pair pre-aggregation."""
        empty = pa.table({"x": pa.array([], type=pa.int64()),
                          "y": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "_pb": pa.array([], type=pa.int32())})
        if g.num_rows == 0 or "ctr" not in g.schema.names:
            return empty
        ctr = g["ctr"].to_numpy(zero_copy_only=False)
        nbr = g["nbr"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nbr, ctr))
        c, d = ctr[order], nbr[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(c)))
        keys = []
        for st, ln in zip(starts, lens):
            if ln < 2:
                continue
            adj = d[st:st + ln]
            iu, ju = np.triu_indices(ln, k=1)
            v, w = adj[iu], adj[ju]
            keys.append((np.minimum(v, w) << np.int64(32))
                        | np.maximum(v, w))
        if not keys:
            return empty
        uk, cnt = np.unique(np.concatenate(keys), return_counts=True)
        pb = (uk % np.int64(buckets)).astype(np.int32)
        return pa.table({"x": pa.array(uk >> np.int64(32)),
                         "y": pa.array(uk & np.int64(0xFFFFFFFF)),
                         "n": pa.array(cnt.astype(np.int64)),
                         "_pb": pa.array(pb)})

    def merge_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"node_a": pa.array([], type=pa.int64()),
                          "node_b": pa.array([], type=pa.int64()),
                          "n_common": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "x" not in g.schema.names:
            return empty
        key = ((g["x"].to_numpy(zero_copy_only=False) << np.int64(32))
               | g["y"].to_numpy(zero_copy_only=False))
        n = g["n"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)) \
            .astype(np.int64)
        x = (uk >> np.int64(32)).astype(np.int64)
        y = (uk & np.int64(0xFFFFFFFF)).astype(np.int64)
        return pa.table({"node_a": pa.array(x), "node_b": pa.array(y),
                         "n_common": pa.array(tot)})

    if broadcast_deg:
        centers = dedup.map_batches(doubled, batch_format="pyarrow")
    else:
        # scale path: no driver degree table — explode both centers
        # stateless, attach the center degree through ONE node-hash
        # bucketed union join, filter the cap map-side
        from ..blocks import attach_lookup_bucketed

        def explode_both(batch: pa.Table) -> pa.Table:
            lo = batch["lo"].to_numpy(zero_copy_only=False)
            hi = batch["hi"].to_numpy(zero_copy_only=False)
            return pa.table({"ctr": pa.array(np.concatenate([lo, hi])),
                             "nbr": pa.array(np.concatenate([hi, lo]))})

        raw = dedup.map_batches(explode_both, batch_format="pyarrow")
        with_dc = attach_lookup_bucketed(raw, deg_ds, "ctr", "d", "_dc",
                                         lookup_key="node",
                                         buckets=buckets)

        def cap_filter(batch: pa.Table) -> pa.Table:
            dc = batch["_dc"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            kept = batch.filter(pa.array(dc <= max_center_degree)) \
                .drop_columns(["_dc"])
            cb = (kept["ctr"].to_numpy(zero_copy_only=False)
                  % np.int64(buckets)).astype(np.int32)
            return kept.append_column("_cb", pa.array(cb))

        centers = with_dc.map_batches(cap_filter, batch_format="pyarrow")

    pairs = centers.groupby("_cb") \
        .map_groups(wedge_pairs, batch_format="pyarrow") \
        .groupby("_pb").map_groups(merge_pairs, batch_format="pyarrow")

    if broadcast_deg:
        def jac_broadcast(batch: pa.Table) -> pa.Table:
            out_schema = pa.schema([
                ("node_a", pa.int64()), ("node_b", pa.int64()),
                ("n_common", pa.int64()), ("jaccard", pa.float64())])
            if batch.num_rows == 0:
                return out_schema.empty_table()
            dn, dv = ray.get(dref)
            x = batch["node_a"].to_numpy(zero_copy_only=False)
            y = batch["node_b"].to_numpy(zero_copy_only=False)
            tot = batch["n_common"].to_numpy(zero_copy_only=False)
            dx = dv[np.searchsorted(dn, x)]
            dy = dv[np.searchsorted(dn, y)]
            jac = tot.astype(np.float64) / (dx + dy - tot)
            return batch.append_column("jaccard", pa.array(jac)) \
                .cast(out_schema)

        return pairs.map_batches(jac_broadcast, batch_format="pyarrow")

    from ..blocks import attach_lookup_bucketed

    with_dx = attach_lookup_bucketed(pairs, deg_ds, "node_a", "d",
                                     "_dx", lookup_key="node",
                                     buckets=buckets)
    with_dxy = attach_lookup_bucketed(with_dx, deg_ds, "node_b", "d",
                                      "_dy", lookup_key="node",
                                      buckets=buckets)

    def jac_joined(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("node_a", pa.int64()), ("node_b", pa.int64()),
            ("n_common", pa.int64()), ("jaccard", pa.float64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        tot = batch["n_common"].to_numpy(zero_copy_only=False)
        dx = batch["_dx"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dy = batch["_dy"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        jac = tot.astype(np.float64) / (dx + dy - tot)
        return pa.table({"node_a": batch["node_a"],
                         "node_b": batch["node_b"],
                         "n_common": batch["n_common"],
                         "jaccard": pa.array(jac)}).cast(out_schema)

    return with_dxy.map_batches(jac_joined, batch_format="pyarrow")


def bfs_hops(edges, sources, a_col: str = "a", b_col: str = "b",
             max_iters: int = 200, partitions: int | None = None,
             buckets: int = 64, frontier_mode: str = "broadcast"):
    """Multi-source BFS hop distances over the undirected distinct edge
    set — the reachability / network-distance operator (getid -r's
    recursive closure, src/command_getid.cpp, generalized from "which
    ids" to "how far"). Exact-oracle-able via a recursive CTE.

    Two execution modes (identical results, pinned by pytest):
      * frontier_mode="broadcast" (default): the adjacency is shuffled
        ONCE into pinned blocks; each round broadcasts the sorted
        frontier via ray.put, runs one shuffle-free map over the pinned
        adjacency, and folds the (<= node-count) candidate partials on
        the driver. Driver memory is O(nodes) — the same declared
        node-scale seam PageRank carries; right whenever the node table
        fits the driver (up to ~1e9 ids), and ~10x faster per round
        because the edge set never re-shuffles.
      * frontier_mode="dataset": frontier, visited and edges all stay
        DATASETS (the k_core discipline) — two bucket exchanges per
        round, nothing node-scale on the driver; the path for graphs
        whose node set itself exceeds driver RAM.
    Rounds = graph eccentricity in both modes.

    Returns (node:int64, hops:int64) for every node reachable from
    `sources` (sources themselves at hops 0)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if partitions is None:
        partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))

    sources = list(sources)
    if len(sources) == 0:
        # empty source set reaches nothing; the broadcast probe below
        # would index an empty frontier array (fr[pos_c] with fr empty)
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "hops": pa.array([], type=pa.int64())}))

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        key = np.unique((lo[keep] << np.int64(32)) | hi[keep])
        lo, hi = key >> np.int64(32), key & np.int64(0xFFFFFFFF)
        ctr = np.concatenate([lo, hi])
        nbr = np.concatenate([hi, lo])
        return pa.table({"ctr": pa.array(ctr), "nbr": pa.array(nbr),
                         "_b": pa.array((ctr % np.int64(buckets))
                                        .astype(np.int32))})

    adj = edges.map_batches(canon, batch_format="pyarrow") \
        .repartition(partitions).materialize()

    src = np.unique(np.asarray(list(sources), dtype=np.int64))

    if frontier_mode == "broadcast":
        visited = src.copy()
        frontier = src.copy()
        out_nodes = [src]
        out_hops = [np.zeros(len(src), np.int64)]
        for hop in range(1, max_iters + 1):
            fref = ray.put(np.sort(frontier))

            def exp(batch: pa.Table, _f=fref) -> pa.Table:
                fr = ray.get(_f)
                ctr = batch["ctr"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(fr, ctr)
                pos_c = np.minimum(pos, len(fr) - 1)
                hit = (pos < len(fr)) & (fr[pos_c] == ctr)
                cand = np.unique(
                    batch["nbr"].to_numpy(zero_copy_only=False)[hit])
                return pa.table({"cand": pa.array(cand)})

            parts = adj.map_batches(exp, batch_format="pyarrow") \
                .take_all()
            if parts:
                cand = np.unique(np.asarray([r["cand"] for r in parts],
                                            dtype=np.int64))
            else:
                cand = np.empty(0, np.int64)
            pos = np.searchsorted(visited, cand)
            pos_c = np.minimum(pos, max(len(visited) - 1, 0))
            new = cand[~((pos < len(visited))
                         & (visited[pos_c] == cand))] \
                if len(visited) else cand
            if not len(new):
                break
            visited = np.sort(np.concatenate([visited, new]))
            frontier = new
            out_nodes.append(new)
            out_hops.append(np.full(len(new), hop, np.int64))
        return rd.from_arrow(pa.table({
            "node": pa.array(np.concatenate(out_nodes)),
            "hops": pa.array(np.concatenate(out_hops))}))
    dist = rd.from_arrow(pa.table({
        "node": pa.array(src),
        "hops": pa.array(np.zeros(len(src), np.int64))})) \
        .materialize()
    frontier = dist.select_columns(["node"]).materialize()

    def node_b(batch: pa.Table) -> pa.Table:
        v = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(v.astype(np.int64)),
                         "_b": pa.array((v % np.int64(buckets))
                                        .astype(np.int32))})

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"cand": pa.array([], type=pa.int64())})
        names = g.schema.names
        if g.num_rows == 0 or "ctr" not in names:
            return empty
        if "node" in names:
            fr = np.sort(g.filter(pc.is_valid(g["node"]))["node"]
                         .to_numpy(zero_copy_only=False))
            eg = g.filter(pc.is_valid(g["ctr"]))
        else:
            return empty          # bucket holds frontier only, no edges
        if eg.num_rows == 0 or not len(fr):
            return empty
        ctr = eg["ctr"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(fr, ctr)
        pos_c = np.minimum(pos, len(fr) - 1)
        hit = (pos < len(fr)) & (fr[pos_c] == ctr)
        cand = np.unique(eg["nbr"].to_numpy(zero_copy_only=False)[hit])
        return pa.table({"cand": pa.array(cand)})

    def fresh(g: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], type=pa.int64())})
        names = g.schema.names
        if g.num_rows == 0 or "cand" not in names:
            return empty
        if "node" in names:
            seen = np.sort(g.filter(pc.is_valid(g["node"]))["node"]
                           .to_numpy(zero_copy_only=False))
        else:
            seen = np.array([], dtype=np.int64)
        cand = np.unique(g.filter(pc.is_valid(g["cand"]))["cand"]
                         .to_numpy(zero_copy_only=False))
        if not len(cand):
            return empty
        if len(seen):
            pos = np.searchsorted(seen, cand)
            pos_c = np.minimum(pos, len(seen) - 1)
            new = cand[~((pos < len(seen)) & (seen[pos_c] == cand))]
        else:
            new = cand
        return pa.table({"node": pa.array(new)})

    for hop in range(1, max_iters + 1):
        fb = frontier.map_batches(node_b, batch_format="pyarrow")
        cand = adj.union(fb).groupby("_b") \
            .map_groups(expand, batch_format="pyarrow")

        def cand_b(batch: pa.Table) -> pa.Table:
            v = batch["cand"].to_numpy(zero_copy_only=False)
            return pa.table({"cand": pa.array(v),
                             "_b2": pa.array((v % np.int64(buckets))
                                             .astype(np.int32))})

        def seen_b(batch: pa.Table) -> pa.Table:
            v = batch["node"].to_numpy(zero_copy_only=False)
            return pa.table({"node": pa.array(v),
                             "_b2": pa.array((v % np.int64(buckets))
                                             .astype(np.int32))})

        new = cand.map_batches(cand_b, batch_format="pyarrow") \
            .union(dist.select_columns(["node"])
                   .map_batches(seen_b, batch_format="pyarrow")) \
            .groupby("_b2").map_groups(fresh, batch_format="pyarrow") \
            .materialize()
        if new.count() == 0:
            break
        hopped = new.map_batches(
            lambda t, h=hop: t.append_column(
                "hops", pa.array(np.full(t.num_rows, h, np.int64))),
            batch_format="pyarrow")
        dist = dist.union(hopped).repartition(partitions).materialize()
        frontier = new
    return dist


def label_propagation(edges, iters: int = 5, a_col: str = "a",
                      b_col: str = "b", partitions: int | None = None,
                      buckets: int = 64, mode: str = "broadcast"):
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007): every node starts as its own label; each round every
    node adopts the most frequent label among its neighbours' PREVIOUS
    labels (ties to the smallest label — the determinism rule that
    makes the fixed-round result pin-able). Rows-only by design: the
    update is iterative and order-sensitive.

    Scale shape per round (nothing node-scale on the driver):
      1. label attach: adjacency buckets on the CENTER endpoint, the
         label table buckets the same; one sorted-probe per bucket
         tags each (ctr, nbr) edge with ctr's current label, then
         pre-aggregates (nbr, label) counts IN-BUCKET.
      2. vote: partial counts re-bucket on the NEIGHBOUR value; one
         lexsort per bucket sums counts per (node, label) and takes
         the (count desc, label asc) winner per node.
    Labels stay a Dataset, materialized pinned per round (the
    iterative block-growth landmine).

    Returns (node:int64, label:int64) after `iters` rounds."""
    import ray

    if partitions is None:
        partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        key = np.unique((lo[keep] << np.int64(32)) | hi[keep])
        return pa.table({"key": pa.array(key),
                         "_db": pa.array((key % np.int64(buckets))
                                         .astype(np.int32))})

    # GLOBAL distinct before doubling: label votes count edge
    # multiplicity, so per-batch dedup alone would let an edge that
    # spans blocks vote more than once (the triangle_count dedup).
    # ONE packed-key bucket fold replaces the two-column native groupby
    # (the dup_spans sort-shuffle-overhead rewrite) and emits the
    # doubled adjacency directly.
    def dedup_double(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.schema.names:
            return pa.table({"ctr": pa.array([], type=pa.int64()),
                             "nbr": pa.array([], type=pa.int64()),
                             "_b": pa.array([], type=pa.int32())})
        key = np.unique(g["key"].to_numpy(zero_copy_only=False))
        lo, hi = key >> np.int64(32), key & np.int64(0xFFFFFFFF)
        ctr = np.concatenate([lo, hi])
        nbr = np.concatenate([hi, lo])
        return pa.table({"ctr": pa.array(ctr), "nbr": pa.array(nbr),
                         "_b": pa.array((ctr % np.int64(buckets))
                                        .astype(np.int32))})

    adj = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("_db").map_groups(dedup_double, batch_format="pyarrow") \
        .repartition(partitions).materialize()

    def init_label(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ctr" not in batch.schema.names:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "label": pa.array([], type=pa.int64())})
        u = np.unique(batch["ctr"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u), "label": pa.array(u)})

    if mode != "broadcast":
        labels = adj.map_batches(init_label, batch_format="pyarrow") \
            .groupby("node").max("label") \
            .map_batches(lambda t: pa.table({
                "node": t["node"].cast(pa.int64()),
                "label": t["max(label)"].cast(pa.int64())}),
                batch_format="pyarrow").materialize()

    def label_b(batch: pa.Table) -> pa.Table:
        v = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(v), "label": batch["label"],
                         "_b": pa.array((v % np.int64(buckets))
                                        .astype(np.int32))})

    def attach(g: pa.Table) -> pa.Table:
        empty = pa.table({"nbr": pa.array([], type=pa.int64()),
                          "lab": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "_b2": pa.array([], type=pa.int32())})
        names = g.schema.names
        if g.num_rows == 0 or "ctr" not in names or "node" not in names:
            return empty
        lt = g.filter(pc.is_valid(g["node"]))
        eg = g.filter(pc.is_valid(g["ctr"]))
        if eg.num_rows == 0 or lt.num_rows == 0:
            return empty
        lnodes = lt["node"].to_numpy(zero_copy_only=False)
        llabs = lt["label"].to_numpy(zero_copy_only=False)
        o = np.argsort(lnodes)
        lnodes, llabs = lnodes[o], llabs[o]
        ctr = eg["ctr"].to_numpy(zero_copy_only=False)
        nbr = eg["nbr"].to_numpy(zero_copy_only=False)
        lab = llabs[np.searchsorted(lnodes, ctr)]
        key = (nbr << np.int64(32)) | lab
        uk, cnt = np.unique(key, return_counts=True)
        un = (uk >> np.int64(32)).astype(np.int64)
        return pa.table({"nbr": pa.array(un),
                         "lab": pa.array((uk & np.int64(0xFFFFFFFF))
                                         .astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "_b2": pa.array((un % np.int64(buckets))
                                         .astype(np.int32))})

    def vote(g: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], type=pa.int64()),
                          "label": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "nbr" not in g.schema.names:
            return empty
        nbr = g["nbr"].to_numpy(zero_copy_only=False)
        lab = g["lab"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        key = (nbr << np.int64(32)) | lab
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=cnt.astype(np.float64)) \
            .astype(np.int64)
        un = uk >> np.int64(32)
        ul = uk & np.int64(0xFFFFFFFF)
        # winner per node: count desc, label asc — lexsort then first
        order = np.lexsort((ul, -tot, un))
        sn = un[order]
        first = np.ones(len(sn), dtype=bool)
        first[1:] = sn[1:] != sn[:-1]
        return pa.table({"node": pa.array(sn[first]),
                         "label": pa.array(ul[order][first])})

    if mode == "broadcast":
        # labels are node-scale: pin the adjacency once, broadcast the
        # sorted label array per round, fold the (nbr, label) count
        # partials on the driver — the bfs_hops broadcast discipline
        # (same declared PageRank-class seam); the dataset mode below
        # remains for node sets beyond driver RAM. Parity is pinned by
        # pytest on random graphs.
        nparts = adj.map_batches(init_label, batch_format="pyarrow") \
            .take_all()
        lnodes = np.unique(np.asarray([r["node"] for r in nparts],
                                      dtype=np.int64))
        llabs = lnodes.copy()
        for _ in range(iters):
            ref = ray.put((lnodes, llabs))

            def partial(batch: pa.Table, _r=ref) -> pa.Table:
                ln, ll = ray.get(_r)
                ctr = batch["ctr"].to_numpy(zero_copy_only=False)
                nbr = batch["nbr"].to_numpy(zero_copy_only=False)
                lab = ll[np.searchsorted(ln, ctr)]
                key = (nbr << np.int64(32)) | lab
                uk, cnt = np.unique(key, return_counts=True)
                return pa.table({"key": pa.array(uk),
                                 "cnt": pa.array(cnt.astype(np.int64))})

            parts = adj.map_batches(partial, batch_format="pyarrow") \
                .take_all()
            key = np.asarray([r["key"] for r in parts], dtype=np.int64)
            cnt = np.asarray([r["cnt"] for r in parts], dtype=np.int64)
            uk, inv = np.unique(key, return_inverse=True)
            tot = np.bincount(inv, weights=cnt.astype(np.float64)) \
                .astype(np.int64)
            un = uk >> np.int64(32)
            ul = uk & np.int64(0xFFFFFFFF)
            order = np.lexsort((ul, -tot, un))
            sn = un[order]
            first = np.ones(len(sn), dtype=bool)
            first[1:] = sn[1:] != sn[:-1]
            lnodes, llabs = sn[first], ul[order][first]
        import ray.data as rd
        return rd.from_arrow(pa.table({"node": pa.array(lnodes),
                                       "label": pa.array(llabs)}))

    for _ in range(iters):
        lb = labels.map_batches(label_b, batch_format="pyarrow")
        labels = adj.union(lb).groupby("_b") \
            .map_groups(attach, batch_format="pyarrow") \
            .groupby("_b2").map_groups(vote, batch_format="pyarrow") \
            .repartition(partitions).materialize()
    return labels


def clustering_coefficient(edges, a_col: str = "a", b_col: str = "b",
                           buckets: int | None = None,
                           deg_cap: int = 50_000_000):
    """Per-node local clustering coefficient: coeff(v) = 2*t(v) /
    (d(v)*(d(v)-1)) where t(v) is the number of triangles through v —
    the per-node refinement of triangle_count (same compact-forward
    wedge machinery, Latapy 2008): each wedge is generated once, at its
    (degree, id)-smallest corner, and every CLOSED wedge credits all
    THREE corners of the triangle, so each triangle contributes exactly
    +1 to each of its nodes.

    Scale shape (triangle_count's, with the apex carried through): the
    wedge->edge membership probe is a bucketed sorted-array searchsorted
    over the packed (v, w) key; per-bucket hits fold into (node, count)
    partials (constant-size unique+bincount, 3 rows per triangle before
    the fold), ONE groupby(node) Sum, then the triangle counts attach
    onto the degree Dataset through a node-hash bucketed union join
    (blocks.attach_lookup_bucketed — no driver-side table at any size).

    Returns (node:int64, degree:int64, triangles:int64, coeff:float64);
    nodes in no triangle get 0 / 0.0, degree-1 nodes coeff 0.0. The
    float expression is exactly `2.0 * triangles / (degree*(degree-1))`
    so the SQL twin reproduces it bit-for-bit."""
    import ray
    from ray.data.aggregate import Sum

    if buckets is None:
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    dedup, deg_ds, oriented = _canon_deg_oriented(
        edges, a_col, b_col, buckets, deg_cap)

    def wedges(g: pa.Table) -> pa.Table:
        empty = pa.table({"v": pa.array([], type=pa.int64()),
                          "w": pa.array([], type=pa.int64()),
                          "u": pa.array([], type=pa.int64()),
                          "_b": pa.array([], type=pa.int32()),
                          "_e": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "src" not in g.schema.names:
            return empty
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        s, d = src[order], dst[order]
        first = np.ones(len(s), dtype=bool)
        first[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(s)))
        vs, ws, us = [], [], []
        for st, ln in zip(starts, lens):       # per-node triu explode
            if ln < 2:
                continue
            adj = d[st:st + ln]
            iu, ju = np.triu_indices(ln, k=1)
            vs.append(adj[iu])
            ws.append(adj[ju])
            us.append(np.full(len(iu), s[st], dtype=np.int64))
        if not vs:
            return empty
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        u = np.concatenate(us)
        vv, ww = np.minimum(v, w), np.maximum(v, w)
        b = (((vv << np.int64(32)) | ww)
             % np.int64(buckets)).astype(np.int32)
        return pa.table({"v": pa.array(vv), "w": pa.array(ww),
                         "u": pa.array(u), "_b": pa.array(b),
                         "_e": pa.array(np.zeros(len(vv), np.int64))})

    def edge_keyed(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        key = (lo << np.int64(32)) | hi
        b = (key % np.int64(buckets)).astype(np.int32)
        return pa.table({"v": pa.array(lo), "w": pa.array(hi),
                         "u": pa.array(np.full(len(lo), -1, np.int64)),
                         "_b": pa.array(b),
                         "_e": pa.array(np.ones(len(lo), np.int64))})

    wedge_ds = oriented.groupby("_sb").map_groups(
        wedges, batch_format="pyarrow")
    edge_ds = dedup.map_batches(edge_keyed, batch_format="pyarrow")

    def probe(g: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], type=pa.int64()),
                          "t": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "v" not in g.schema.names:
            return empty
        is_edge = g["_e"].to_numpy(zero_copy_only=False) == 1
        key = ((g["v"].to_numpy(zero_copy_only=False) << np.int64(32))
               | g["w"].to_numpy(zero_copy_only=False))
        ek = np.sort(key[is_edge])
        wk = key[~is_edge]
        if not len(ek) or not len(wk):
            return empty
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
        if not hit.any():
            return empty
        wedge = g.filter(pa.array(~is_edge))
        nodes = np.concatenate([
            wedge["u"].to_numpy(zero_copy_only=False)[hit],
            wedge["v"].to_numpy(zero_copy_only=False)[hit],
            wedge["w"].to_numpy(zero_copy_only=False)[hit]])
        un, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(un),
                         "t": pa.array(c.astype(np.int64))})

    tri = wedge_ds.union(edge_ds).groupby("_b") \
        .map_groups(probe, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("t", alias_name="t"))

    from ..blocks import _drop_empty_blocks, attach_lookup_bucketed

    tri = _drop_empty_blocks(tri.materialize())
    if tri is None:
        def zero(batch: pa.Table) -> pa.Table:
            d = batch["d"].to_numpy(zero_copy_only=False)
            n = len(d)
            return pa.table({
                "node": batch["node"],
                "degree": pa.array(d.astype(np.int64)),
                "triangles": pa.array(np.zeros(n, np.int64)),
                "coeff": pa.array(np.zeros(n, np.float64))})
        return deg_ds.map_batches(zero, batch_format="pyarrow")

    with_t = attach_lookup_bucketed(deg_ds, tri, "node", "t", "tri",
                                    lookup_key="node", buckets=buckets)

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.fill_null(batch["tri"], 0).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        denom = d * (d - 1)
        coeff = np.where(denom > 0,
                         (2.0 * t) / np.where(denom > 0, denom, 1), 0.0)
        return pa.table({"node": batch["node"],
                         "degree": pa.array(d),
                         "triangles": pa.array(t),
                         "coeff": pa.array(coeff.astype(np.float64))})

    return with_t.map_batches(finish, batch_format="pyarrow")


def sssp_weighted(edges, sources, a_col: str = "a", b_col: str = "b",
                  w_col: str = "w", max_hops: int | None = None,
                  partitions: int | None = None):
    """Weighted single-source(+multi) shortest paths over the undirected
    distinct edge set — Bellman-Ford with the frontier optimization
    (only nodes improved last round relax this round), which on
    nonnegative weights converges to Dijkstra's fixpoint in at most
    eccentricity-many rounds. With `max_hops` set, distances are the
    exact minimum over paths of <= max_hops edges (the k-round
    Bellman-Ford semantics), which a bounded recursive CTE reproduces
    row-for-row — the exact-oracle mode; max_hops=None runs to
    convergence (true SSSP, pinned against a heapq Dijkstra in pytest).

    Scale shape (the bfs_hops broadcast-mode discipline): the weighted
    adjacency shuffles ONCE into pinned blocks; each round broadcasts
    the sorted frontier (nodes + tentative distances) via ray.put, one
    shuffle-free map emits per-block (nbr, candidate) MIN partials, and
    the driver folds one short row set per block. Driver memory is
    O(nodes) — the declared node-scale seam bfs_hops/pagerank carry;
    the dataset-resident twin follows their documented pattern when the
    node table outgrows the driver.

    Edge weights must be nonnegative int64. Parallel edges keep the
    lightest weight. Returns (node, dist) for every reached node."""
    import ray
    import ray.data as rd

    if partitions is None:
        partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))

    src = np.unique(np.asarray(list(sources), dtype=np.int64))
    if len(src) == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "dist": pa.array([], type=pa.int64())}))

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi, w = lo[keep], hi[keep], w[keep]
        # lightest parallel edge: sort by (lo, hi, w), keep first
        key = (lo << np.int64(32)) | hi
        o = np.lexsort((w, key))
        key, w = key[o], w[o]
        first = np.r_[True, key[1:] != key[:-1]]
        key, w = key[first], w[first]
        lo, hi = key >> np.int64(32), key & np.int64(0xFFFFFFFF)
        ctr = np.concatenate([lo, hi])
        nbr = np.concatenate([hi, lo])
        return pa.table({"ctr": pa.array(ctr), "nbr": pa.array(nbr),
                         "w": pa.array(np.concatenate([w, w]))})

    adj = edges.map_batches(canon, batch_format="pyarrow") \
        .repartition(partitions).materialize()

    best_n = src.copy()                       # sorted node ids
    best_d = np.zeros(len(src), dtype=np.int64)
    frontier_n = src.copy()
    frontier_d = np.zeros(len(src), dtype=np.int64)
    hop = 0
    while len(frontier_n) and (max_hops is None or hop < max_hops):
        hop += 1
        o = np.argsort(frontier_n)
        fref = ray.put((frontier_n[o], frontier_d[o]))

        def relax(batch: pa.Table, _f=fref) -> pa.Table:
            fn, fd = ray.get(_f)
            ctr = batch["ctr"].to_numpy(zero_copy_only=False)
            if len(fn) == 0:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "d": pa.array([], type=pa.int64())})
            pos = np.searchsorted(fn, ctr)
            pos_c = np.minimum(pos, len(fn) - 1)
            hit = (pos < len(fn)) & (fn[pos_c] == ctr)
            nbr = batch["nbr"].to_numpy(zero_copy_only=False)[hit]
            cand = fd[pos_c[hit]] + \
                batch["w"].to_numpy(zero_copy_only=False)[hit]
            o2 = np.lexsort((cand, nbr))
            nbr, cand = nbr[o2], cand[o2]
            first = np.r_[True, nbr[1:] != nbr[:-1]] if len(nbr) \
                else np.array([], dtype=bool)
            return pa.table({"node": pa.array(nbr[first]),
                             "d": pa.array(cand[first])})

        parts = adj.map_batches(relax, batch_format="pyarrow").take_all()
        if not parts:
            break
        nodes = np.asarray([r["node"] for r in parts], dtype=np.int64)
        ds_ = np.asarray([r["d"] for r in parts], dtype=np.int64)
        o3 = np.lexsort((ds_, nodes))
        nodes, ds_ = nodes[o3], ds_[o3]
        first = np.r_[True, nodes[1:] != nodes[:-1]] if len(nodes) \
            else np.array([], dtype=bool)
        nodes, ds_ = nodes[first], ds_[first]
        pos = np.searchsorted(best_n, nodes)
        pos_c = np.minimum(pos, len(best_n) - 1)
        known = (pos < len(best_n)) & (best_n[pos_c] == nodes)
        imp_known = known & (ds_ < best_d[pos_c])
        best_d[pos_c[imp_known]] = ds_[imp_known]
        new = ~known
        frontier_n = np.concatenate([nodes[imp_known], nodes[new]])
        frontier_d = np.concatenate([ds_[imp_known], ds_[new]])
        if new.any():
            merged = np.argsort(np.concatenate([best_n, nodes[new]]),
                                kind="stable")
            all_n = np.concatenate([best_n, nodes[new]])[merged]
            all_d = np.concatenate([best_d, ds_[new]])[merged]
            best_n, best_d = all_n, all_d
    return rd.from_arrow(pa.table({
        "node": pa.array(best_n, type=pa.int64()),
        "dist": pa.array(best_d, type=pa.int64())}))
