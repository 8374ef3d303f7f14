"""Property-based tests (hypothesis) for the geometry/cell kernels — the
reference's test strategy is golden files; these add randomized coverage
the reference lacks (SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmium_tool_ray.functions import cells
from osmium_tool_ray.functions.geometry import to_fix
from osmium_tool_ray.functions.pip import BandedPolygonIndex
from osmium_tool_ray.state.regions import Region, region_cover

lon_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat_st = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@given(lon=lon_st, lat=lat_st, level=st.integers(min_value=0, max_value=29))
@settings(max_examples=200, deadline=None)
def test_cell_contains_its_point(lon, lat, level):
    c = cells.cell_encode(np.array([lon]), np.array([lat]), level)
    lon0, lat0, lon1, lat1 = cells.cell_bounds(c)
    # the encoded cell's rectangle contains the point, up to one ULP of the
    # (lon+180)/360*n arithmetic (a point within one ULP of a cell edge may
    # land in the adjacent cell — same in every engine using this formula)
    tol = 1e-12 * 360
    assert lon0[0] - tol <= lon <= lon1[0] + tol or lon == 180.0
    assert lat0[0] - tol <= lat <= lat1[0] + tol or lat == 90.0
    assert cells.cell_level(c)[0] == level


@given(lon=lon_st, lat=lat_st, plevel=st.integers(0, 10), dlevel=st.integers(0, 10))
@settings(max_examples=100, deadline=None)
def test_parent_is_prefix(lon, lat, plevel, dlevel):
    child_level = plevel + dlevel
    c = cells.cell_encode(np.array([lon]), np.array([lat]), child_level)
    p_direct = cells.cell_encode(np.array([lon]), np.array([lat]), plevel)
    assert cells.cell_parent(c, plevel)[0] == p_direct[0]


@st.composite
def rings(draw):
    k = draw(st.integers(min_value=3, max_value=12))
    cx = draw(st.floats(-100, 100))
    cy = draw(st.floats(-60, 60))
    angles = sorted(draw(st.lists(st.floats(0, 2 * np.pi), min_size=k, max_size=k,
                                  unique=True)))
    radii = draw(st.lists(st.floats(0.5, 20), min_size=k, max_size=k))
    pts = np.array([[cx + r * np.cos(a), cy + r * np.sin(a)]
                    for a, r in zip(angles, radii)])
    np.clip(pts[:, 0], -179.9, 179.9, out=pts[:, 0])
    np.clip(pts[:, 1], -89.9, 89.9, out=pts[:, 1])
    return np.vstack([pts, pts[:1]])


@given(ring=rings(), seed=st.integers(0, 1000))
@settings(max_examples=30, deadline=None)
def test_prefilter_never_changes_membership(ring, seed):
    """The cell-cover prefilter routing must be exactly equivalent to the
    bare banded kernel for arbitrary star-shaped polygons."""
    try:
        reg = Region(name="r", kind="polygon", rings=[ring])
    except ValueError:
        return  # degenerate ring (e.g. duplicate fixed-point points)
    rng = np.random.default_rng(seed)
    env = reg.envelope()
    lon = rng.uniform(env[0] - 1, env[2] + 1, 500)
    lat = rng.uniform(env[1] - 1, env[3] + 1, 500)
    exact = reg.contains(lon, lat)
    from osmium_tool_ray.stages.extract import RegionMatcher
    import pyarrow as pa
    m = RegionMatcher([reg], level=7, mode="mask", prefilter=True)
    batch = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    got = m._masks(batch)[0]
    assert (got == exact).all()


@given(lon=st.lists(lon_st, min_size=1, max_size=50),
       lat=st.lists(lat_st, min_size=1, max_size=50))
@settings(max_examples=50, deadline=None)
def test_bbox_matches_interval_logic(lon, lat):
    n = min(len(lon), len(lat))
    lon, lat = np.array(lon[:n]), np.array(lat[:n])
    reg = Region(name="b", kind="bbox", bbox=(-10.0, -5.0, 20.0, 15.0))
    got = reg.contains(lon, lat)
    fx, fy = to_fix(lon), to_fix(lat)
    want = (fx >= to_fix(-10.0)) & (fx <= to_fix(20.0)) & \
           (fy >= to_fix(-5.0)) & (fy <= to_fix(15.0))
    assert (got == want).all()
