import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.extract import CellEncode, RegionMatcher
from osmium_tool_ray.state.regions import Region, parse_extract_config, region_cover


def _batch(lon, lat):
    n = len(lon)
    return pa.table({
        "image_id": pa.array([f"img{i}" for i in range(n)]),
        "lon": pa.array(lon, type=pa.float64()),
        "lat": pa.array(lat, type=pa.float64()),
    })


STAR = None


def _star_region():
    global STAR
    if STAR is None:
        rng = np.random.default_rng(3)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 60))
        rad = rng.uniform(5, 20, 60)
        ring = np.stack([rad * np.cos(ang) + 30, rad * np.sin(ang) + 10], axis=1)
        ring = np.vstack([ring, ring[:1]])
        STAR = Region(name="star", kind="polygon", rings=[ring])
    return STAR


def test_cover_classification_consistent():
    reg = _star_region()
    interior, boundary = region_cover(reg, level=9)
    assert len(interior) > 0 and len(boundary) > 0
    # every interior cell center must be inside; sample cells
    from osmium_tool_ray.functions.cells import cell_bounds
    lon0, lat0, lon1, lat1 = cell_bounds(interior)
    cen_lon, cen_lat = (lon0 + lon1) / 2, (lat0 + lat1) / 2
    assert reg.contains(cen_lon, cen_lat).all()


def test_prefilter_matches_exact():
    reg = _star_region()
    rng = np.random.default_rng(11)
    lon = rng.uniform(0, 60, 20000)
    lat = rng.uniform(-20, 40, 20000)
    exact = reg.contains(lon, lat)
    m = RegionMatcher([reg], level=9, mode="mask", prefilter=True)
    got = m._masks(_batch(lon, lat))[0]
    assert (got == exact).all()


def test_fanout_multi_region():
    regions = parse_extract_config({"extracts": [
        {"output": "a", "bbox": [0, 0, 10, 10]},
        {"output": "b", "bbox": [5, 5, 20, 20]},
    ]})
    m = RegionMatcher(regions, mode="fanout")
    lon = np.array([1.0, 7.0, 15.0, 50.0])
    lat = np.array([1.0, 7.0, 15.0, 50.0])
    out = m(_batch(lon, lat))
    rows = sorted(zip(out["image_id"].to_pylist(), out["extract_id"].to_pylist()))
    assert rows == [("img0", 0), ("img1", 0), ("img1", 1), ("img2", 1)]


def test_fanout_no_match_keeps_schema():
    regions = parse_extract_config({"extracts": [{"output": "a", "bbox": [0, 0, 1, 1]}]})
    m = RegionMatcher(regions)
    out = m(_batch(np.array([50.0]), np.array([50.0])))
    assert out.num_rows == 0
    assert "extract_id" in out.schema.names


def test_cell_encode_stage():
    st = CellEncode(level=8)
    out = st(_batch(np.array([0.0, 10.0]), np.array([0.0, 10.0])))
    assert out["cell"].type == pa.int64()
    assert out.num_rows == 2
