"""Multi-extract fan-out at reference scale: the reference allows up to 500
extracts per run (command_extract.cpp:77) served by one pass; verify the
single-pass matcher handles 120 regions correctly."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.extract import RegionMatcher
from osmium_tool_ray.state.regions import parse_extract_config


def test_120_region_single_pass(ray_session):
    import ray
    import ray.data as rd

    # 120 bbox tiles over a 12x10 grid of 30x18-degree cells
    extracts = []
    for i in range(12):
        for j in range(10):
            extracts.append({"output": f"t_{i}_{j}",
                             "bbox": [-180 + i * 30, -90 + j * 18,
                                      -180 + (i + 1) * 30, -90 + (j + 1) * 18]})
    regions = parse_extract_config({"extracts": extracts})
    assert len(regions) == 120

    rng = np.random.default_rng(33)
    n = 20000
    lon = rng.uniform(-179.99, 179.99, n)
    lat = rng.uniform(-89.99, 89.99, n)
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array([f"p{i}" for i in range(n)]),
        "lon": pa.array(lon), "lat": pa.array(lat),
    })).repartition(8)

    matched = ds.map_batches(RegionMatcher, fn_constructor_args=(ray.put(regions),),
                             batch_format="pyarrow", concurrency=2)
    rows = matched.select_columns(["image_id", "extract_id"]).take_all()
    # interior grid tiles don't overlap; every point falls in >= 1 tile
    # (boundary-coincident points can match 2 adjacent tiles: inclusive edges)
    by_point: dict = {}
    for r in rows:
        by_point.setdefault(r["image_id"], []).append(r["extract_id"])
    assert len(by_point) == n
    multi = sum(1 for v in by_point.values() if len(v) > 1)
    assert multi < n * 0.001  # random floats essentially never sit on edges

    # spot-check 50 points against direct region membership
    for i in rng.integers(0, n, 50):
        pid = f"p{i}"
        expect = [e for e, reg in enumerate(regions)
                  if reg.contains(np.array([lon[i]]), np.array([lat[i]]))[0]]
        assert sorted(by_point[pid]) == expect
