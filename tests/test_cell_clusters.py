"""Grid-DBSCAN dense-cell clustering (stages/spatial.dense_cell_clusters)
vs a pure-Python flood fill over the same density grid."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.functions.cells import cell_encode, cell_to_xy
from osmium_tool_ray.stages.spatial import dense_cell_clusters

LEVEL = 6


def _points(seed=4, n=4000):
    rng = np.random.default_rng(seed)
    # a few gaussian blobs + uniform noise -> some dense regions
    blobs = []
    for cx, cy in [(-50, 10), (-48, 12), (30, -40), (100, 60)]:
        blobs.append(np.stack([
            rng.normal(cx, 3.0, n // 5), rng.normal(cy, 2.0, n // 5)],
            axis=1))
    noise = np.stack([rng.uniform(-179, 179, n // 5),
                      rng.uniform(-84, 84, n // 5)], axis=1)
    pts = np.concatenate(blobs + [noise])
    np.clip(pts[:, 0], -179.9, 179.9, out=pts[:, 0])
    np.clip(pts[:, 1], -84.9, 84.9, out=pts[:, 1])
    return pts


def _flood_fill(pts, min_count):
    cells = cell_encode(pts[:, 0], pts[:, 1], LEVEL)
    uc, cnt = np.unique(cells, return_counts=True)
    ucs = uc.view(np.int64)
    counts = dict(zip(ucs.tolist(), cnt.tolist()))
    dense = ucs[cnt >= min_count]
    xs, ys = cell_to_xy(dense.view(np.uint64))
    coord = {(int(x), int(y)): int(c)
             for x, y, c in zip(xs, ys, dense)}
    seen, clusters = set(), []
    for p in sorted(coord):
        if p in seen:
            continue
        comp, stack = [], [p]
        seen.add(p)
        while stack:
            q = stack.pop()
            comp.append(q)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    r = (q[0] + dx, q[1] + dy)
                    if r in coord and r not in seen:
                        seen.add(r)
                        stack.append(r)
        cells_i = [coord[q] for q in comp]
        rep = str(min(cells_i))
        total = sum(counts[c] for c in cells_i)
        clusters.append((rep, len(comp), total))
    return sorted(clusters)


def test_clusters_match_flood_fill():
    pts = _points()
    tbl = pa.table({"lon": pa.array(pts[:, 0]),
                    "lat": pa.array(pts[:, 1])})
    got = dense_cell_clusters(rd.from_arrow(tbl).repartition(6),
                              LEVEL, min_count=8).to_pandas()
    got_t = sorted((str(r.rep), int(r.n_cells), int(r.total_points))
                   for r in got.itertuples())
    exp = _flood_fill(pts, 8)
    # rep comparison: engine rep is min STRING of the component under
    # connected_components' string labels; recompute exp reps as the
    # min of the string forms to match
    assert len(got_t) == len(exp)
    assert [c[1:] for c in got_t] != []
    # compare cluster size/total multisets (rep naming differs: string
    # min vs numeric min)
    assert sorted(c[1:] for c in got_t) == sorted(c[1:] for c in exp)


def test_distributed_path_parity():
    pts = _points(seed=12, n=2500)
    tbl = pa.table({"lon": pa.array(pts[:, 0]),
                    "lat": pa.array(pts[:, 1])})
    ds = rd.from_arrow(tbl).repartition(4)
    a = dense_cell_clusters(ds, LEVEL, min_count=6).to_pandas()
    b = dense_cell_clusters(ds, LEVEL, min_count=6,
                            driver_cap=0).to_pandas()
    key = lambda df: sorted((int(r.n_cells), int(r.total_points))
                            for r in df.itertuples())
    assert key(a) == key(b)
