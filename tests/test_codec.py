import numpy as np

from osmium_tool_ray.functions.imagecodec import (
    decode_batch, encode_batch, gen_pixels, psnr,
)


def test_roundtrip_png_lossless():
    idx = np.arange(0, 50, 2)
    pix = gen_pixels(idx)
    enc = encode_batch(pix, np.array(["png"] * len(idx)))
    dec, w, h = decode_batch(enc)
    assert (dec == pix).all()
    assert (w == 16).all() and (h == 16).all()


def test_jpeg_lossy_psnr_above_40():
    idx = np.arange(1, 51, 2)
    pix = gen_pixels(idx)
    enc = encode_batch(pix, np.array(["jpeg"] * len(idx)))
    dec, _, _ = decode_batch(enc)
    assert not (dec == pix).all()
    p = psnr(pix, dec)
    assert (p >= 40.0).all()


def test_deterministic():
    a = gen_pixels(np.array([123]))
    b = gen_pixels(np.array([123]))
    assert (a == b).all()
    assert not (a == gen_pixels(np.array([124]))).all()
