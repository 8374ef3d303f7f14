"""SsimVerify (stages/media.SsimVerify) vs a per-image scalar SSIM
reference (global-statistics form, population variance, standard C1/C2),
on the synthetic corpus encode/decode pair."""
import numpy as np
import pyarrow as pa

from osmium_tool_ray.functions import imagecodec as cc
from osmium_tool_ray.stages.media import SsimVerify


def _scalar_ssim(x, y):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    mx, my = x.mean(), y.mean()
    vx, vy = x.var(), y.var()
    cov = ((x - mx) * (y - my)).mean()
    return ((2 * mx * my + c1) * (2 * cov + c2)) \
        / ((mx * mx + my * my + c1) * (vx + vy + c2))


def test_ssim_matches_scalar_reference():
    idx = np.arange(40, dtype=np.int64)
    pix = cc.gen_pixels(idx)
    fmts = np.array(["png", "jpeg"] * 20)
    blobs = cc.encode_batch(pix, fmts)
    ids = pa.array([f"img{i:010d}" for i in idx], type=pa.string())
    out = SsimVerify()(pa.table({"image_id": ids, "bytes": blobs}))
    dec, w, h = cc.decode_batch(out["bytes"])
    for i in range(len(idx)):
        want = _scalar_ssim(pix[i], dec[i])
        assert out["ssim"][i].as_py() == want, i


def test_ssim_identical_is_one_and_degraded_below():
    idx = np.arange(8, dtype=np.int64)
    pix = cc.gen_pixels(idx)
    blobs = cc.encode_batch(pix, np.array(["png"] * 8))   # lossless
    ids = pa.array([f"img{i:010d}" for i in idx], type=pa.string())
    out = SsimVerify()(pa.table({"image_id": ids, "bytes": blobs}))
    assert all(v == 1.0 for v in out["ssim"].to_pylist())
    assert all(out["ssim_ok"].to_pylist())
    # jpeg (quantized) degrades but stays near 1 for the synthetic noise
    blobs_j = cc.encode_batch(pix, np.array(["jpeg"] * 8))
    out_j = SsimVerify()(pa.table({"image_id": ids, "bytes": blobs_j}))
    assert all(v < 1.0 for v in out_j["ssim"].to_pylist())


def test_ssim_empty_batch():
    out = SsimVerify()(pa.table({
        "image_id": pa.array([], type=pa.string()),
        "bytes": pa.array([], type=pa.binary())}))
    assert out.num_rows == 0 and "ssim" in out.schema.names
