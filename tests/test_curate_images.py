"""Image curation flagship (pipelines/curation.curate_images): per-tile
top-k parity vs pandas, and the PSNR gate actually drops corrupt rows."""

import numpy as np
import pandas as pd
import pyarrow as pa

from osmium_tool_ray.functions.imagecodec import encode_batch, gen_pixels
from osmium_tool_ray.pipelines.curation import curate_images


def _corpus(n=300, corrupt=()):
    ids = np.arange(n, dtype=np.int64)
    pix = gen_pixels(ids)
    for c in corrupt:          # wrong source pixels -> PSNR far below 40
        pix[c] = gen_pixels(np.array([c + 999_999], dtype=np.int64))[0]
    fmts = np.where(ids % 2 == 0, "png", "jpeg")
    return pa.table({
        "image_id": pa.array([f"img{i:010d}" for i in ids]),
        "bytes": encode_batch(pix, fmts),
        "phash": pa.array((ids * 2654435761) % (1 << 40), type=pa.int64()),
        "lon": pa.array(((ids * 7919) % 36000) / 100.0 - 180.0),
        "lat": pa.array(((ids * 104729) % 17000) / 100.0 - 85.0),
    })


def _expected(tbl, level, k, drop=()):
    df = tbl.select(["image_id", "phash", "lon", "lat"]).to_pandas()
    df = df[~df.index.isin(list(drop))]
    n = 1 << level
    df["cell_x"] = np.clip(np.floor((df.lon + 180.0) / 360.0 * n)
                           .astype(np.int64), 0, n - 1)
    df["cell_y"] = np.clip(np.floor((df.lat + 90.0) / 180.0 * n)
                           .astype(np.int64), 0, n - 1)
    df = df.sort_values(["cell_x", "cell_y", "phash", "image_id"])
    df["rk"] = df.groupby(["cell_x", "cell_y"]).cumcount()
    df = df[df.rk < k]
    return sorted(map(tuple, df[["image_id", "cell_x", "cell_y", "rk"]]
                      .itertuples(index=False)))


def test_curate_images_topk_parity(ray_session):
    import ray.data as rd

    tbl = _corpus()
    out = curate_images(rd.from_arrow(tbl).repartition(4), level=3,
                        per_tile_k=4, buckets=5)
    mine = sorted((r["image_id"], r["cell_x"], r["cell_y"], r["rk"])
                  for r in out.take_all())
    assert mine == _expected(tbl, 3, 4)


def test_curate_images_drops_corrupt(ray_session):
    import ray.data as rd

    corrupt = (7, 42)
    tbl = _corpus(corrupt=corrupt)
    out = curate_images(rd.from_arrow(tbl).repartition(3), level=2,
                        per_tile_k=100, buckets=3)
    got_ids = {r["image_id"] for r in out.take_all()}
    assert f"img{7:010d}" not in got_ids
    assert f"img{42:010d}" not in got_ids
    assert len(got_ids) == 298
    assert sorted((r["image_id"], r["cell_x"], r["cell_y"], r["rk"])
                  for r in out.take_all()) \
        == _expected(tbl, 2, 100, drop=corrupt)
