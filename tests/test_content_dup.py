"""Format-invariant image content dedup (stages/media.ContentHash /
content_dup_images): cross-format re-encodes collapse, pixel edits
diverge."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.functions.imagecodec import encode_batch, gen_pixels
from osmium_tool_ray.stages.media import ContentHash, content_dup_images


def _corpus():
    ids = np.arange(40, dtype=np.int64)
    pix = gen_pixels(ids)
    fmts = np.where(ids % 2 == 0, "png", "jpeg")
    rows = {"image_id": [f"img{i:010d}" for i in ids],
            "bytes": encode_batch(pix, fmts)}
    # cross-format copies of ids 0..4 at +1000
    cp = np.arange(5, dtype=np.int64)
    other = np.where(cp % 2 == 0, "jpeg", "png")
    copies = encode_batch(gen_pixels(cp), other)
    rows2 = {"image_id": [f"img{i + 1000:010d}" for i in cp],
             "bytes": copies}
    # a pixel-edited copy of id 6 at 2006 (must NOT match)
    edited = gen_pixels(np.array([6], dtype=np.int64))
    edited[0, 0] ^= 0xF0
    rows3 = {"image_id": ["img0000002006"],
             "bytes": encode_batch(edited, np.array(["png"]))}
    return pa.concat_tables([
        pa.table({"image_id": pa.array(rows["image_id"]),
                  "bytes": rows["bytes"]}),
        pa.table({"image_id": pa.array(rows2["image_id"]),
                  "bytes": rows2["bytes"]}),
        pa.table({"image_id": pa.array(rows3["image_id"]),
                  "bytes": rows3["bytes"]}),
    ])


def test_content_dup_cross_format(ray_session):
    import ray.data as rd

    out = content_dup_images(rd.from_arrow(_corpus()).repartition(3),
                             buckets=4)
    pairs = sorted((r["image_id"], r["dup_of"]) for r in out.take_all())
    assert pairs == [(f"img{i + 1000:010d}", f"img{i:010d}")
                     for i in range(5)]


def test_content_hash_quantize_flag(ray_session):
    """quantize=False must NOT collapse a png and its jpeg re-encode
    (jpeg stores quantized pixels, png stores the raw grid)."""
    import ray.data as rd

    ids = np.array([2], dtype=np.int64)
    tbl = pa.table({
        "image_id": pa.array(["img0000000002", "img0000001002"]),
        "bytes": pa.concat_arrays([
            encode_batch(gen_pixels(ids), np.array(["png"])),
            encode_batch(gen_pixels(ids), np.array(["jpeg"])),
        ]),
    })
    strict = content_dup_images(rd.from_arrow(tbl), quantize=False,
                                buckets=2)
    assert strict.count() == 0
    loose = content_dup_images(rd.from_arrow(tbl), quantize=True,
                               buckets=2)
    assert [(r["image_id"], r["dup_of"]) for r in loose.take_all()] \
        == [("img0000001002", "img0000000002")]
