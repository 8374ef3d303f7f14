"""Cross-modal near-dup (stages/dedup.crossmodal_neardup): colocated
pair parity vs brute force, via-labeling on overlapping signals, and
hot-cell cap behavior."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.dedup import colocated_pairs, crossmodal_neardup


def _images(n=400, seed=2):
    rng = np.random.default_rng(seed)
    return pa.table({
        "image_id": pa.array([f"img{i:06d}" for i in range(n)]),
        "phash": pa.array(rng.integers(0, 2**40, n, dtype=np.int64)),
        "lon": pa.array(rng.uniform(-10, 10, n)),       # dense: shared cells
        "lat": pa.array(rng.uniform(-10, 10, n)),
    })


def _brute_colocated(tbl, level, cap):
    from osmium_tool_ray.functions.cells import lonlat_to_xy

    x, y = lonlat_to_xy(tbl["lon"].to_numpy(), tbl["lat"].to_numpy(), level)
    key = y * (1 << level) + x
    ids = np.asarray(tbl["image_id"].to_pylist(), dtype=str)
    pairs = set()
    for k in np.unique(key):
        members = np.sort(ids[key == k])
        if 2 <= len(members) <= cap:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((members[i], members[j]))
    return pairs


def test_colocated_pairs_match_bruteforce(ray_session):
    import ray.data as rd

    tbl = _images()
    got = {(r["id_a"], r["id_b"]) for r in
           colocated_pairs(rd.from_arrow(tbl).repartition(5),
                           level=6, cap=500).take_all()}
    want = _brute_colocated(tbl, 6, 500)
    assert got == want and len(want) > 0


def test_colocated_hot_cell_capped(ray_session):
    import ray.data as rd

    # 50 images in ONE cell with cap 10: the cell is skipped entirely
    tbl = pa.table({
        "image_id": pa.array([f"img{i:03d}" for i in range(50)]),
        "phash": pa.array(np.arange(50, dtype=np.int64)),
        "lon": pa.array(np.full(50, 1.0)),
        "lat": pa.array(np.full(50, 1.0)),
    })
    out = colocated_pairs(rd.from_arrow(tbl).repartition(3),
                          level=6, cap=10).take_all()
    assert out == []


def test_crossmodal_via_labels(ray_session):
    import ray.data as rd

    # two images: identical phash (phash pair) AND same cell (colocated)
    # -> via='both'; a third image colocated with #1 but phash-far
    tbl = pa.table({
        "image_id": pa.array(["img0", "img1", "img2"]),
        "phash": pa.array([0x1234567812345678, 0x1234567812345678,
                           -0x7FFF000011112222], type=pa.int64()),
        "lon": pa.array([2.0, 2.0, 2.0]),
        "lat": pa.array([3.0, 3.0, 3.0]),
    })
    out = {(r["id_a"], r["id_b"]): r["via"] for r in
           crossmodal_neardup(rd.from_arrow(tbl), t=12, cap=500,
                              level=6).take_all()}
    assert out[("img0", "img1")] == "both"
    assert out[("img0", "img2")] == "colocated"
    assert out[("img1", "img2")] == "colocated"
