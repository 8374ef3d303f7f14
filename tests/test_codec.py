import numpy as np
import pyarrow as pa

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


def test_frame_sample(ray_session):
    """Video -> sampled-frame explode: every stride-th frame comes out as
    its own row whose decoded pixels equal the deterministic source."""
    import ray.data as rd

    from osmium_tool_ray.functions.imagecodec import decode_batch, gen_pixels
    from osmium_tool_ray.stages.media import FrameSample, make_fake_videos

    ids = np.array([3, 7])
    vids = make_fake_videos(ids, n_frames=6, w=8, h=8)
    ds = rd.from_arrow(pa.table({"video_id": pa.array([f"v{i}" for i in ids]),
                                 "video": vids}))
    out = ds.map_batches(FrameSample, fn_constructor_kwargs={"stride": 2},
                         batch_format="pyarrow", batch_size=1,
                         concurrency=2).take_all()
    assert sorted((r["video_id"], r["frame_no"]) for r in out) == \
        [("v3", 0), ("v3", 2), ("v3", 4), ("v7", 0), ("v7", 2), ("v7", 4)]
    for r in out:
        pix, w, h = decode_batch(pa.array([r["bytes"]], type=pa.large_binary()))
        src = gen_pixels(np.array([int(r["video_id"][1:]) * 1000
                                   + r["frame_no"]]), 8, 8)
        assert np.array_equal(pix[0], src[0])
