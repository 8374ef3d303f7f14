"""Round-5 operators: Hilbert layout (curve properties + pruned-scan
parity), raster slope / morphology vs dense numpy references, SobelEdges
vs a pure-numpy reference, per-cell exact quantiles vs numpy."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.functions.cells import lonlat_to_xy
from osmium_tool_ray.stages.layout import hilbert_key


def _grid_lonlat(level):
    n = 1 << level
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    lon = (xs.ravel() + 0.5) / n * 360.0 - 180.0
    lat = (ys.ravel() + 0.5) / n * 180.0 - 90.0
    return lon, lat, xs.ravel(), ys.ravel()


def test_hilbert_bijection_and_adjacency():
    # every cell gets a distinct key covering [0, 4^level), and
    # consecutive keys are 4-neighbors (the property Morton lacks)
    for level in (3, 5):
        lon, lat, xs, ys = _grid_lonlat(level)
        d = hilbert_key(lon, lat, level)
        n2 = (1 << level) ** 2
        assert sorted(d.tolist()) == list(range(n2))
        o = np.argsort(d)
        step = np.abs(np.diff(xs[o])) + np.abs(np.diff(ys[o]))
        assert (step == 1).all()


def test_hilbert_matches_grid_coords():
    # keys must be a pure function of the cell, not the raw floats
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    d = hilbert_key(lon, lat, 8)
    x, y = lonlat_to_xy(lon, lat, 8)
    # same-cell points share the key
    key = x * 1000 + y
    for k in np.unique(key)[:50]:
        assert len(np.unique(d[key == k])) == 1


def test_hilbert_layout_pruned_scan(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.layout import (
        bbox_manifest_scan, block_bbox_manifest, hilbert_layout,
    )

    rng = np.random.default_rng(11)
    n = 4000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    ds = rd.from_arrow(pa.table({
        "pid": pa.array(np.arange(n)),
        "lon": pa.array(lon), "lat": pa.array(lat)})).repartition(16)
    laid = hilbert_layout(ds, level=10).materialize()
    refs, lo1, hi1, lo2, hi2 = block_bbox_manifest(laid)
    bbox = (-30.0, -20.0, 40.0, 35.0)
    out, stats = bbox_manifest_scan(refs, lo1, hi1, lo2, hi2, bbox)
    got = sorted(r["pid"] for r in out.take_all())
    want = sorted(np.flatnonzero(
        (lon >= bbox[0]) & (lon <= bbox[2])
        & (lat >= bbox[1]) & (lat <= bbox[3])).tolist())
    assert got == want
    # spatial sort must actually prune: the bbox covers ~10% of the
    # globe, a Hilbert layout should skip a decent share of blocks
    assert stats["blocks_scanned"] < stats["blocks_total"]


def test_slope_cells_dense_reference(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.raster import slope_cells

    rng = np.random.default_rng(7)
    level, n = 4, 16
    npts = 3000
    lon = rng.uniform(-180, 180, npts)
    lat = rng.uniform(-90, 90, npts)
    out = slope_cells(rd.from_arrow(pa.table(
        {"lon": pa.array(lon), "lat": pa.array(lat)})).repartition(5),
        level=level).take_all()

    dense = np.zeros((n, n), dtype=np.int64)
    x = np.clip(np.floor((lon + 180) / 360 * n).astype(int), 0, n - 1)
    y = np.clip(np.floor((lat + 90) / 180 * n).astype(int), 0, n - 1)
    np.add.at(dense, (x, y), 1)
    got = {(r["cell_x"], r["cell_y"]):
           (r["n"], r["ddx"], r["ddy"], r["grad2"]) for r in out}
    occupied = {(int(a), int(b)) for a, b in zip(*np.nonzero(dense))}
    assert set(got) == occupied
    for (cx, cy), (cnt, ddx, ddy, g2) in got.items():
        xp = dense[cx + 1, cy] if cx + 1 < n else 0
        xm = dense[cx - 1, cy] if cx - 1 >= 0 else 0
        yp = dense[cx, cy + 1] if cy + 1 < n else 0
        ym = dense[cx, cy - 1] if cy - 1 >= 0 else 0
        assert cnt == dense[cx, cy]
        assert ddx == xp - xm and ddy == yp - ym
        assert g2 == ddx * ddx + ddy * ddy


def test_coverage_morphology_dense_reference(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.raster import coverage_morphology

    rng = np.random.default_rng(9)
    level, n = 4, 16
    npts = 120            # sparse: leaves holes to dilate into
    lon = rng.uniform(-180, 180, npts)
    lat = rng.uniform(-90, 90, npts)
    out = coverage_morphology(rd.from_arrow(pa.table(
        {"lon": pa.array(lon), "lat": pa.array(lat)})).repartition(4),
        level=level).take_all()

    occ = np.zeros((n, n), dtype=bool)
    x = np.clip(np.floor((lon + 180) / 360 * n).astype(int), 0, n - 1)
    y = np.clip(np.floor((lat + 90) / 180 * n).astype(int), 0, n - 1)
    occ[x, y] = True
    got = {(r["cell_x"], r["cell_y"]): (r["covered"], r["eroded"])
           for r in out}
    want = {}
    for cx in range(n):
        for cy in range(n):
            nbrs = [(cx + i, cy + j) for i in (-1, 0, 1)
                    for j in (-1, 0, 1)]
            in_grid = [(a, b) for a, b in nbrs
                       if 0 <= a < n and 0 <= b < n]
            nocc = sum(occ[a, b] for a, b in in_grid)
            if nocc == 0:
                continue                      # not in the dilation
            full = sum(occ[a, b] for a, b in nbrs
                       if 0 <= a < n and 0 <= b < n) == 9
            want[(cx, cy)] = (int(occ[cx, cy]), int(full))
    assert got == want


def test_sobel_edges_reference(ray_session):
    import ray.data as rd

    from osmium_tool_ray.functions.imagecodec import encode_batch
    from osmium_tool_ray.stages.media import SobelEdges

    H = W = 16
    rng = np.random.default_rng(5)
    imgs = [np.full((H, W, 3), 80, dtype=np.uint8),
            rng.integers(0, 256, (H, W, 3), dtype=np.uint8)]
    grad = np.zeros((H, W, 3), dtype=np.uint8)   # vertical ramp
    grad[:, :, :] = (np.arange(W) * 16).astype(np.uint8)[None, :, None]
    imgs.append(grad)
    n = len(imgs)
    fmt = np.asarray(["png"] * n)
    t = pa.table({
        "image_id": pa.array([f"img{i:010d}" for i in range(n)]),
        "bytes": encode_batch(np.asarray(imgs, dtype=np.uint8)
                              .reshape(n, -1), fmt),
        "fmt": pa.array(fmt.tolist()),
        "w": pa.array(np.full(n, W, dtype=np.int32)),
        "h": pa.array(np.full(n, H, dtype=np.int32))})
    out = rd.from_arrow(t).map_batches(
        SobelEdges, batch_format="pyarrow", concurrency=1).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)

    for i, img in enumerate(imgs):
        lum = img.astype(np.int64).sum(axis=2)
        mags = []
        for r in range(1, H - 1):
            for c in range(1, W - 1):
                gx = (lum[r - 1, c + 1] + 2 * lum[r, c + 1]
                      + lum[r + 1, c + 1]) \
                    - (lum[r - 1, c - 1] + 2 * lum[r, c - 1]
                       + lum[r + 1, c - 1])
                gy = (lum[r + 1, c - 1] + 2 * lum[r + 1, c]
                      + lum[r + 1, c + 1]) \
                    - (lum[r - 1, c - 1] + 2 * lum[r - 1, c]
                       + lum[r - 1, c + 1])
                mags.append(abs(gx) + abs(gy))
        mags = np.asarray(mags, dtype=np.float64)
        assert out.iloc[i]["edge_mean"] == mags.mean(), i
        assert out.iloc[i]["edge_max"] == mags.max(), i
    assert out.iloc[0]["edge_mean"] == 0.0          # constant image
    assert out.iloc[1]["edge_mean"] > out.iloc[2]["edge_mean"]


def test_cell_value_quantiles_numpy(ray_session):
    from __ray_entry__ import q_cell_value_quantiles

    sf = "/root/testdata/sf0.001"
    out = {(r["cell_x"], r["cell_y"]):
           (r["n_events"], r["q1"], r["med"], r["q3"])
           for r in q_cell_value_quantiles(sf).take_all()}
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "value"])
    eid = t["event_id"].to_numpy()
    vc = np.rint(t["value"].to_numpy() * 100.0).astype(np.int64)
    n6 = 64
    lon = ((eid * 7919) % 36000) / 100.0 - 180.0
    lat = ((eid * 104729) % 17000) / 100.0 - 85.0
    cx = np.clip(np.floor((lon + 180) / 360 * n6).astype(int), 0, 63)
    cy = np.clip(np.floor((lat + 90) / 180 * n6).astype(int), 0, 63)
    want = {}
    for k in set(zip(cx.tolist(), cy.tolist())):
        v = np.sort(vc[(cx == k[0]) & (cy == k[1])])
        m = len(v)
        want[k] = (m, v[(m - 1) // 4], v[(m - 1) // 2],
                   v[(3 * (m - 1)) // 4])
    assert out == want
