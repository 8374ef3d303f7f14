"""Real audio/video codec seams (functions/avcodec): a REAL PCM16 WAV
round-trips through AudioFeatures in this container (stdlib-wave
fallback — no soundfile needed); soundfile / PyAV paths are skipif-gated
the way functions/pilcodec's PIL path is."""

import io
import wave

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.functions import avcodec
from osmium_tool_ray.stages.media import AudioFeatures, FrameSample


def _wav_bytes(pcm: np.ndarray, sr: int = 8000, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        if nch > 1:
            inter = np.empty(pcm.size * nch, dtype=np.int16)
            for c in range(nch):
                inter[c::nch] = pcm
            w.writeframes(inter.tobytes())
        else:
            w.writeframes(pcm.astype(np.int16).tobytes())
    return buf.getvalue()


def test_decode_wav_record_stdlib():
    rng = np.random.default_rng(5)
    pcm = rng.integers(-2000, 2000, 1234).astype(np.int16)
    sr, got = avcodec.decode_audio_record(_wav_bytes(pcm, sr=22050))
    assert sr == 22050
    assert np.array_equal(got, pcm)


def test_decode_wav_multichannel_takes_channel0():
    pcm = np.arange(-50, 50, dtype=np.int16)
    sr, got = avcodec.decode_audio_record(_wav_bytes(pcm, nch=2))
    assert sr == 8000
    assert np.array_equal(got, pcm)


def test_audio_features_real_wav_roundtrip():
    """The round-4 seam ask: REAL WAV bytes through the AudioFeatures
    stage, features matching a direct numpy computation."""
    rng = np.random.default_rng(11)
    pcms = [rng.integers(-3000, 3000, n).astype(np.int16)
            for n in (800, 1600, 999)]
    batch = pa.table({
        "audio_id": pa.array(["w0", "w1", "w2"]),
        "audio": pa.array([_wav_bytes(p, sr=16000) for p in pcms],
                          type=pa.large_binary()),
    })
    out = AudioFeatures()(batch)
    assert "audio" not in out.schema.names
    for i, p in enumerate(pcms):
        f = p.astype(np.float64)
        sb = np.signbit(f)
        assert out["sr"][i].as_py() == 16000
        assert out["n_samples"][i].as_py() == len(p)
        assert out["rms"][i].as_py() == pytest.approx(
            float(np.sqrt(np.mean(f * f))))
        assert out["zcr"][i].as_py() == pytest.approx(
            float(np.count_nonzero(sb[1:] != sb[:-1])) / (len(p) - 1))


def test_mixed_fake_real_audio_raises():
    from osmium_tool_ray.stages.media import make_fake_audio

    fake = make_fake_audio(np.array([1], dtype=np.int64))[0].as_py()
    real = _wav_bytes(np.zeros(100, dtype=np.int16))
    batch = pa.table({"audio": pa.array([fake, real],
                                        type=pa.large_binary())})
    with pytest.raises(ValueError, match="mixed"):
        AudioFeatures()(batch)


@pytest.mark.skipif(not avcodec.HAVE_SOUNDFILE,
                    reason="soundfile not installed (seam declared)")
def test_decode_audio_soundfile_path():
    pcm = np.arange(-100, 100, dtype=np.int16)
    sr, got = avcodec.decode_audio_record(_wav_bytes(pcm, sr=44100))
    assert sr == 44100
    assert np.array_equal(got, pcm)


def _mp4_bytes(n_frames: int = 6, w: int = 32, h: int = 16) -> bytes:
    import av

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=5)
        stream.width, stream.height = w, h
        stream.pix_fmt = "yuv420p"
        for f in range(n_frames):
            img = np.full((h, w, 3), f * 30, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    return buf.getvalue()


@pytest.mark.skipif(not avcodec.HAVE_AV,
                    reason="PyAV not installed (seam declared)")
def test_frame_sample_real_mp4_roundtrip():
    """Real MP4 through FrameSample: sampled frames come back as
    fake-png records decodable by the shared imagecodec."""
    from osmium_tool_ray.functions import imagecodec

    rec = _mp4_bytes(n_frames=6, w=32, h=16)
    batch = pa.table({"video_id": pa.array(["v0"]),
                      "video": pa.array([rec], type=pa.large_binary())})
    out = FrameSample(stride=2)(batch)
    assert out.num_rows == 3
    assert out["frame_no"].to_pylist() == [0, 2, 4]
    pix, w, h = imagecodec.decode_batch(out["bytes"])
    assert (w == 32).all() and (h == 16).all()
    # yuv420 is lossy; frame brightness must still be monotone in f
    means = pix.reshape(3, -1).mean(axis=1)
    assert means[0] < means[1] < means[2]


def test_frame_sample_real_bytes_without_av_raises():
    if avcodec.HAVE_AV:
        pytest.skip("PyAV installed — covered by the roundtrip test")
    batch = pa.table({"video_id": pa.array(["v0"]),
                      "video": pa.array([b"\x00\x00\x00\x18ftypmp42" +
                                         b"\x00" * 64],
                                        type=pa.large_binary())})
    with pytest.raises(ImportError, match="PyAV"):
        FrameSample(stride=2)(batch)
