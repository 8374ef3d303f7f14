"""Z-order layout + partition-pruned range scan (stages/layout.py):
range math vs brute force, scan parity vs a plain filter, and the
pruning guarantee (no block skipped that holds a matching row; some
blocks actually skipped for a small query box)."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.layout import (
    block_manifest, morton_key, zorder_layout, zranges_for_bbox, zrange_scan,
)

LEVEL = 10


def test_morton_key_monotone_in_cell():
    """Points in the same level-L cell share a key; distinct cells get
    distinct keys."""
    lon = np.array([10.0, 10.0000001, 120.0])
    lat = np.array([20.0, 20.0000001, -45.0])
    z = morton_key(lon, lat, LEVEL)
    assert z[0] == z[1] and z[0] != z[2]


def test_zranges_cover_matches_bruteforce():
    """Every point inside the bbox has its key inside some range; points
    far outside the cover fall outside every range."""
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 20_000)
    lat = rng.uniform(-90, 90, 20_000)
    box = (-30.0, -20.0, 55.0, 35.0)
    z = morton_key(lon, lat, LEVEL)
    ranges = zranges_for_bbox(*box, LEVEL)
    starts, ends = ranges[:, 0], ranges[:, 1]
    pos = np.searchsorted(starts, z, side="right") - 1
    in_range = (pos >= 0) & (z < ends[np.clip(pos, 0, len(ends) - 1)])
    inside = (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    assert not (inside & ~in_range).any()          # cover is a superset
    # ranges are sorted, disjoint, merged
    assert (starts[1:] > ends[:-1]).all() and (ends > starts).all()


@pytest.fixture(scope="module")
def zsorted(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    n = 30_000
    tbl = pa.table({
        "image_id": pa.array([f"img{i:010d}" for i in range(n)]),
        "lon": pa.array(rng.uniform(-180, 180, n)),
        "lat": pa.array(rng.uniform(-90, 90, n)),
    })
    ds = zorder_layout(rd.from_arrow(tbl).repartition(16), level=LEVEL)
    refs, mins, maxs = block_manifest(ds.materialize())
    return tbl, refs, mins, maxs


def test_zrange_scan_parity_and_pruning(zsorted):
    tbl, refs, mins, maxs = zsorted
    box = (20.0, 10.0, 45.0, 30.0)

    def exact(batch: pa.Table) -> np.ndarray:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        return ((lon >= box[0]) & (lon <= box[2])
                & (lat >= box[1]) & (lat <= box[3]))

    ranges = zranges_for_bbox(*box, LEVEL)
    out, stats = zrange_scan(refs, mins, maxs, ranges, predicate=exact)
    got = sorted(r["image_id"] for r in out.take_all())

    lon = tbl["lon"].to_numpy()
    lat = tbl["lat"].to_numpy()
    m = (lon >= box[0]) & (lon <= box[2]) & (lat >= box[1]) & (lat <= box[3])
    want = sorted(np.asarray(tbl["image_id"])[m].tolist())
    assert got == want and len(got) > 0
    # the whole point: a small box must not scan every block
    assert 0 < stats["blocks_scanned"] < stats["blocks_total"]


def test_zregion_scan_polygon_parity(zsorted):
    """Polygon region served off the z-layout == plain full-scan PIP."""
    from osmium_tool_ray.state.regions import Region
    from osmium_tool_ray.stages.layout import zregion_scan

    tbl, refs, mins, maxs = zsorted
    poly = np.asarray([[0.0, -20.0], [40.0, 0.0], [0.0, 30.0],
                       [-40.0, 0.0], [0.0, -20.0]])
    reg = Region(name="p", kind="polygon", rings=[poly])
    out, stats = zregion_scan(refs, mins, maxs, reg, LEVEL)
    got = sorted(r["image_id"] for r in out.take_all())
    m = reg.contains(tbl["lon"].to_numpy(), tbl["lat"].to_numpy())
    want = sorted(np.asarray(tbl["image_id"])[m].tolist())
    assert got == want and len(got) > 0
    assert 0 < stats["blocks_scanned"] < stats["blocks_total"]


def test_zrange_scan_empty_region(zsorted):
    _, refs, mins, maxs = zsorted
    # a sliver box so tiny it covers at most a few cells; may prune all
    ranges = zranges_for_bbox(0.00001, 0.00001, 0.00002, 0.00002, LEVEL)
    out, stats = zrange_scan(refs, mins, maxs, ranges)
    assert stats["blocks_scanned"] <= stats["blocks_total"]
    if out is not None:
        assert out.count() >= 0
