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


def test_augment_hflip_involution(ray_session):
    """hflip twice restores the original bytes on lossless (png) rows,
    and crop emits the right dims with pixel content matching the
    decoded center window."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.sources.corpus import images_dataset
    from osmium_tool_ray.stages.media import Augment
    from osmium_tool_ray.functions.imagecodec import decode_batch

    ds = images_dataset("/root/testdata/sf0.001", with_bytes=True) \
        .limit(200)
    orig = ds.take_batch(200, batch_format="pyarrow")
    png = orig.filter(pa.compute.equal(orig["fmt"], "png"))

    once = Augment(mode="hflip")(png)
    twice = Augment(mode="hflip")(once)
    assert twice["bytes"].to_pylist() == png["bytes"].to_pylist()
    # single flip changes pixels but keeps dims
    assert once["bytes"].to_pylist() != png["bytes"].to_pylist()
    assert once["w"].to_pylist() == png["w"].to_pylist()

    crop = Augment(mode="crop", crop_w=8, crop_h=8)(png)
    assert set(crop["w"].to_pylist()) == {8}
    cpix, cw, ch = decode_batch(crop["bytes"])
    opix, ow, oh = decode_batch(png["bytes"])
    n = len(cw)
    ref = opix.reshape(n, 16, 16, 3)[:, 4:12, 4:12, :].reshape(n, -1)
    assert (cpix == ref).all()


def test_augment_rejects_bad_mode():
    import pytest as _pytest

    from osmium_tool_ray.stages.media import Augment

    with _pytest.raises(ValueError):
        Augment(mode="vflip")


def test_pilcodec_sniffs_fake_records_without_pil():
    """pilcodec is the codec the media stages load; fake-magic records
    must route to the vectorized fake codec by sniff (no PIL import), so
    the synthetic corpus decodes identically whichever codec is loaded."""
    import numpy as np

    from osmium_tool_ray.functions import imagecodec, pilcodec

    idx = np.arange(6, dtype=np.uint64)
    pix = imagecodec.gen_pixels(idx)
    fmts = np.array(["png", "jpeg"] * 3)
    enc = imagecodec.encode_batch(pix, fmts)
    got_pix, got_w, got_h = pilcodec.decode_batch(enc)
    ref_pix, ref_w, ref_h = imagecodec.decode_batch(enc)
    assert (got_pix == ref_pix).all()
    assert (got_w == ref_w).all() and (got_h == ref_h).all()


def test_pilcodec_real_bytes_raise_without_pil():
    import pyarrow as pa
    import pytest as _pytest

    from osmium_tool_ray.functions import pilcodec

    if pilcodec.HAVE_PIL:
        _pytest.skip("PIL installed; covered by the round-trip test")
    real_png = pa.array([b"\x89PNG\r\n\x1a\n" + b"\x00" * 16],
                        type=pa.large_binary())
    with _pytest.raises(ImportError):
        pilcodec.decode_batch(real_png)


def test_pil_roundtrip_real_codec():
    """Real-PIL path (skipped when PIL is absent, as in this container):
    deterministic source pixels encode to REAL PNG/JPEG bytes, run
    through DecodeVerify (PNG lossless => PSNR 99 >= 40 dB gate) and
    Augment (hflip involution restores lossless bytes)."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from osmium_tool_ray.functions import imagecodec, pilcodec

    if not pilcodec.HAVE_PIL:
        _pytest.skip("PIL not installed in this container")
    from osmium_tool_ray.stages.media import Augment, DecodeVerify

    idx = np.arange(8, dtype=np.uint64)
    pix = imagecodec.gen_pixels(idx)
    png = pilcodec.encode_batch(pix, np.array(["png"] * 8))
    ids = pa.array([f"img{i:010d}" for i in range(8)])
    batch = pa.table({"image_id": ids, "bytes": png,
                      "w": pa.array(np.full(8, 16, np.int32)),
                      "h": pa.array(np.full(8, 16, np.int32)),
                      "fmt": pa.array(["png"] * 8)})
    out = DecodeVerify()(batch)
    assert out["pix_ok"].to_pylist() == [True] * 8
    assert min(out["psnr_db"].to_pylist()) >= 40.0
    flip = Augment(mode="hflip")
    twice = flip(flip(batch))
    p2, _, _ = pilcodec.decode_batch(twice["bytes"])
    assert (p2 == pix).all()
    # lossy real JPEG: decoded pixels within the quality-95 envelope
    jpg = pilcodec.encode_batch(pix, np.array(["jpeg"] * 8))
    jp, _, _ = pilcodec.decode_batch(jpg)
    assert imagecodec.psnr(pix, jp).min() >= 20.0


def test_scene_cut_vs_numpy(ray_session):
    """SceneCut diffs equal the direct numpy frame diff; cuts land
    exactly at scene boundaries (scene_len=3 -> cut at frame 3 only)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.functions.imagecodec import gen_pixels
    from osmium_tool_ray.stages.media import SceneCut, make_fake_videos

    idx = np.array([5, 17, 230], dtype=np.int64)
    vids = pa.table({
        "video_id": pa.array([f"v{i:010d}" for i in idx]),
        "video": make_fake_videos(idx, n_frames=6, w=8, h=8, scene_len=3)})
    out = rd.from_arrow(vids).map_batches(
        SceneCut, fn_constructor_kwargs={"threshold": 16.0},
        batch_format="pyarrow", concurrency=1).take_all()
    got = {(r["video_id"], r["frame_no"]): (r["diff"], r["is_cut"])
           for r in out}
    assert len(got) == len(idx) * 5
    for i in idx:
        frames = [gen_pixels(np.array([i * 1000 + f // 3],
                                      dtype=np.uint64), 8, 8)[0]
                  for f in range(6)]
        for f in range(1, 6):
            want = np.abs(frames[f].astype(np.int16)
                          - frames[f - 1].astype(np.int16)).mean()
            d, cut = got[(f"v{i:010d}", f)]
            assert abs(d - want) < 1e-12
            assert cut == (f == 3)  # the single scene boundary
