import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.functions.cells import cell_bounds, cell_encode
from osmium_tool_ray.functions.imagecodec import decode_batch
from osmium_tool_ray.stages.raster import rasterize_region, tile_mosaic
from osmium_tool_ray.state.regions import Region


def test_rasterize_square():
    reg = Region(name="sq", kind="polygon", rings=[np.array(
        [[0.0, 0.0], [20.0, 0.0], [20.0, 20.0], [0.0, 20.0], [0.0, 0.0]])])
    t = rasterize_region(reg, level=5)  # 11.25-degree cells
    cells = t["cell"].to_numpy()
    cov = t["coverage"].to_numpy()
    # total covered area ~= polygon area (in cell units)
    lon0, lat0, lon1, lat1 = cell_bounds(cells.view(np.uint64))
    cell_area = (lon1 - lon0) * (lat1 - lat0)
    est = float((cov * cell_area).sum())
    assert abs(est - 400.0) / 400.0 < 0.05  # within supersample resolution
    # a cell center well inside has coverage 1
    c_in = cell_encode(np.array([10.0]), np.array([10.0]), 5).view(np.int64)[0]
    assert cov[np.nonzero(cells == c_in)[0][0]] == 1.0
    # all coverages in (0, 1]
    assert ((cov > 0) & (cov <= 1.0)).all()


def test_rasterize_bbox_region():
    reg = Region(name="b", kind="bbox", bbox=(0.0, 0.0, 11.25, 11.25))
    t = rasterize_region(reg, level=5)
    cov = dict(zip(t["cell"].to_pylist(), t["coverage"].to_pylist()))
    c = cell_encode(np.array([5.0]), np.array([5.0]), 5).view(np.int64)[0]
    assert cov[int(c)] == 1.0


def test_tile_mosaic(ray_session):
    import ray.data as rd
    from osmium_tool_ray.sources.corpus import images_from_range_batch

    tbl = images_from_range_batch({"id": np.arange(200)}, with_bytes=True)
    ds = rd.from_arrow(tbl)
    out = tile_mosaic(ds, level=2, tile_px=4).take_all()
    assert sum(r["n_members"] for r in out) == 200
    for r in out[:3]:
        pix, w, h = decode_batch(pa.array([r["mosaic"]], type=pa.large_binary()))
        assert w[0] == r["mosaic_w"] and h[0] == r["mosaic_h"]
        assert pix.shape[1] == r["mosaic_w"] * r["mosaic_h"] * 3
    # deterministic: same input -> byte-identical mosaics
    out2 = tile_mosaic(ds, level=2, tile_px=4).take_all()
    m1 = {r["cell"]: r["mosaic"] for r in out}
    m2 = {r["cell"]: r["mosaic"] for r in out2}
    assert m1 == m2


def test_tile_mosaic_max_members_and_no_blob_shuffle(ray_session):
    import ray.data as rd
    from osmium_tool_ray.sources.corpus import images_from_range_batch

    tbl = images_from_range_batch({"id": np.arange(300)}, with_bytes=True)
    ds = rd.from_arrow(tbl)
    out = tile_mosaic(ds, level=0, tile_px=2, max_members=10).take_all()
    assert len(out) == 1 and out[0]["n_members"] == 10
    # winners are the 10 smallest ids — mosaic must be byte-identical to
    # assembling from just those rows (losers' blobs never participate)
    sub = rd.from_arrow(tbl.slice(0, 10))
    out_sub = tile_mosaic(sub, level=0, tile_px=2, max_members=10).take_all()
    assert out[0]["mosaic"] == out_sub[0]["mosaic"]


def test_tile_mosaic_grouped_schema_excludes_bytes(ray_session, monkeypatch):
    """Hard rule: the full `bytes` blob column never enters the
    groupby(cell) shuffle — only fixed-size thumbnails do."""
    import ray.data as rd
    import ray.data.grouped_data as gd
    from osmium_tool_ray.sources.corpus import images_from_range_batch

    seen_schemas = []
    orig = gd.GroupedData.map_groups

    def spy(self, *a, **kw):
        seen_schemas.append(set(self._dataset.schema().names))
        return orig(self, *a, **kw)

    monkeypatch.setattr(gd.GroupedData, "map_groups", spy)
    tbl = images_from_range_batch({"id": np.arange(50)}, with_bytes=True)
    tile_mosaic(rd.from_arrow(tbl), level=1, tile_px=2).take_all()
    assert seen_schemas and all("bytes" not in s for s in seen_schemas)
