"""Connected components (stages/dedup.connected_components): driver
union-find fast path vs a reference implementation, and the forced
distributed label-propagation + pointer-jumping path on the same
graphs (both must agree with each other and the reference)."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.dedup import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(ray_session, pairs, parts=4, **kw):
    import ray.data as rd

    tbl = pa.table({"id_a": pa.array([a for a, _ in pairs]),
                    "id_b": pa.array([b for _, b in pairs])})
    out = connected_components(rd.from_arrow(tbl).repartition(parts), **kw)
    return {r["image_id"]: r["rep"] for r in out.take_all()}


def _random_pairs(n_nodes=300, n_edges=240, seed=7):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:04d}" for i in range(n_nodes)]
    pairs = []
    for _ in range(n_edges):
        a, b = rng.choice(n_nodes, 2, replace=False)
        pairs.append((nodes[min(a, b)], nodes[max(a, b)]))
    pairs += [("zz1", "zz2"), ("zz9", "zz9")]
    return pairs


def test_cc_driver_path_matches_union_find(ray_session):
    pairs = _random_pairs()
    got = _run(ray_session, pairs)
    want = _union_find(pairs)
    assert got == want
    assert all(v <= k for k, v in got.items())    # rep = component min
    assert got["zz2"] == "zz1" and got["zz9"] == "zz9"


def test_cc_distributed_path_matches_driver(ray_session):
    """Force the label-propagation scale path (driver_cap=0) on a graph
    with a chain (worst diameter) + random clutter; must equal the
    driver union-find exactly."""
    pairs = _random_pairs(n_nodes=60, n_edges=30, seed=3)
    pairs += [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(15)]
    got = _run(ray_session, pairs, parts=3, driver_cap=0)
    assert got == _union_find(pairs)
    assert set(got[f"c{i:03d}"] for i in range(16)) == {"c000"}


def test_cc_empty(ray_session):
    import ray.data as rd

    tbl = pa.table({"id_a": pa.array([], type=pa.string()),
                    "id_b": pa.array([], type=pa.string())})
    assert connected_components(rd.from_arrow(tbl)).take_all() == []
