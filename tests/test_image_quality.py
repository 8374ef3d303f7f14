"""ImageQuality stage (stages/media.ImageQuality): numpy parity for the
stats, flag logic on crafted near-black / flat / noisy images."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.functions.imagecodec import encode_batch, gen_pixels
from osmium_tool_ray.stages.media import ImageQuality


def _encode(pix):
    return encode_batch(pix, np.full(len(pix), "png"))


def test_image_quality_numpy_parity(ray_session):
    import ray.data as rd

    ids = np.arange(50, dtype=np.int64)
    pix = gen_pixels(ids)
    tbl = pa.table({"image_id": pa.array([f"img{i:010d}" for i in ids]),
                    "bytes": _encode(pix)})
    out = rd.from_arrow(tbl).repartition(3) \
        .map_batches(lambda b: ImageQuality()(b), batch_format="pyarrow")
    rows = {r["image_id"]: r for r in out.take_all()}
    for i in ids:
        r = rows[f"img{i:010d}"]
        f = pix[i].reshape(-1, 3).astype(np.float64)
        assert abs(r["mean_r"] - f[:, 0].mean()) < 1e-9
        assert abs(r["mean_g"] - f[:, 1].mean()) < 1e-9
        assert abs(r["mean_b"] - f[:, 2].mean()) < 1e-9
        assert abs(r["contrast"] - pix[i].astype(np.float64).std()) < 1e-9
        hist = np.bincount(pix[i], minlength=256) / pix[i].size
        ent = -np.where(hist > 0, hist * np.log2(hist), 0).sum()
        assert abs(r["entropy_bits"] - ent) < 1e-9
        assert r["quality_ok"]          # random pixels pass every gate


def test_image_quality_flags(ray_session):
    import ray.data as rd

    k = 16 * 16 * 3
    crafted = np.stack([
        np.zeros(k, dtype=np.uint8),              # black: dark+flat
        np.full(k, 255, dtype=np.uint8),          # white: bright+flat
        np.full(k, 128, dtype=np.uint8),          # grey: flat/low entropy
        gen_pixels(np.array([1], dtype=np.int64))[0],   # noisy: ok
    ])
    tbl = pa.table({"image_id": pa.array([f"img{i:010d}" for i in range(4)]),
                    "bytes": _encode(crafted)})
    out = rd.from_arrow(tbl) \
        .map_batches(lambda b: ImageQuality()(b), batch_format="pyarrow")
    ok = {r["image_id"]: r["quality_ok"] for r in out.take_all()}
    assert ok == {"img0000000000": False, "img0000000001": False,
                  "img0000000002": False, "img0000000003": True}


def test_sniff_image_meta(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.media import sniff_image_meta

    ids = np.arange(30, dtype=np.int64)
    fmts = np.where(ids % 2 == 0, "png", "jpeg")
    tbl = pa.table({"image_id": pa.array([f"img{i:010d}" for i in ids]),
                    "bytes": encode_batch(gen_pixels(ids), fmts)})
    out = {r["image_id"]: (r["fmt_sniffed"], r["w"], r["h"],
                           r["rec_bytes"])
           for r in sniff_image_meta(rd.from_arrow(tbl).repartition(3))
           .take_all()}
    for i in ids:
        want_fmt = "png" if i % 2 == 0 else "jpeg"
        assert out[f"img{i:010d}"] == (want_fmt, 16, 16, 8 + 16 * 16 * 3)
