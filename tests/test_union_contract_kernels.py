"""Kernel invariants for the round-4 union/verify rewrites:
_star_contract (per-block spanning-star contraction must preserve the
global min-label result exactly) and _pair_set_inters_idx (grouped
vectorized intersect == per-pair brute force). Pure numpy — no Ray."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.dedup import (_minlabel_union_np,
                                          _pair_set_inters_idx,
                                          _star_contract)


def _rand_graph(rng, n_nodes, n_edges, id_base=0):
    a = rng.integers(0, n_nodes, n_edges) + id_base
    b = rng.integers(0, n_nodes, n_edges) + id_base
    keep = a != b
    a, b = a[keep], b[keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return lo.astype(np.int64), hi.astype(np.int64)


def test_star_contract_preserves_global_union():
    rng = np.random.default_rng(11)
    for trial in range(12):
        a, b = _rand_graph(rng, n_nodes=rng.integers(5, 400),
                           n_edges=rng.integers(1, 2000))
        if not len(a):
            continue
        direct = sorted(_minlabel_union_np(a, b))
        # split edges into random "blocks", contract each, re-union
        nblocks = int(rng.integers(1, 6))
        assign = rng.integers(0, nblocks, len(a))
        parts = []
        for blk in range(nblocks):
            m = assign == blk
            if not m.any():
                continue
            t = pa.table({"a": pa.array(a[m]), "b": pa.array(b[m])})
            ct = _star_contract(t)
            if ct.num_rows:
                parts.append(ct)
        ca = np.concatenate([t["a"].to_numpy(zero_copy_only=False)
                             for t in parts])
        cb = np.concatenate([t["b"].to_numpy(zero_copy_only=False)
                             for t in parts])
        # contraction shrinks (or keeps) the edge count
        assert len(ca) <= len(a)
        via_stars = sorted(_minlabel_union_np(ca, cb))
        assert via_stars == direct


def test_star_contract_string_ids_and_worst_case_chain():
    # chain 0-1-2-...-k split across 3 blocks: min label must cross
    k = 40
    a = np.arange(k, dtype=np.int64)
    b = a + 1
    parts = []
    for blk in range(3):
        m = np.arange(k) % 3 == blk
        t = pa.table({"a": pa.array([f"id{x:04d}" for x in a[m]]),
                      "b": pa.array([f"id{x:04d}" for x in b[m]])})
        parts.append(_star_contract(t))
    ca = np.concatenate([np.asarray(t["a"].to_pylist()) for t in parts])
    cb = np.concatenate([np.asarray(t["b"].to_pylist()) for t in parts])
    out = dict(_minlabel_union_np(ca, cb))
    assert set(out.values()) == {"id0000"}
    assert len(out) == k                  # every non-root maps to root


def test_star_contract_passthrough_shapes():
    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())})
    assert _star_contract(empty).num_rows == 0
    one = pa.table({"a": pa.array([7], type=pa.int64()),
                    "b": pa.array([3], type=pa.int64())})
    ct = _star_contract(one)
    assert ct["a"].to_pylist() == [7] and ct["b"].to_pylist() == [3]
    assert ct.schema.field("a").type == pa.int64()


def test_pair_set_inters_idx_matches_brute_force():
    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(3, 120))
        sets = [np.unique(rng.integers(0, 300,
                                       size=rng.integers(0, 50))
                          .astype(np.uint64)) for _ in range(n)]
        sizes = np.array([len(s) for s in sets], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        vals = (np.concatenate(sets) if sizes.sum()
                else np.empty(0, np.uint64))
        state = (vals, offs, sizes)
        m = int(rng.integers(1, 4000))
        pos_a = rng.integers(0, n, m)
        pos_b = rng.integers(0, n, m)
        mask = rng.random(m) > 0.4 if trial % 2 else None
        got = _pair_set_inters_idx(pos_a, pos_b, state, mask=mask,
                                   chunk_elems=int(rng.integers(8, 500)))
        want = np.array(
            [len(np.intersect1d(sets[p], sets[q]))
             if (mask is None or mask[i]) else 0
             for i, (p, q) in enumerate(zip(pos_a, pos_b))],
            dtype=np.int64)
        assert np.array_equal(got, want)
