"""Audio modality (stages/media.make_fake_audio + AudioFeatures):
segmented vectorized decode parity vs a per-record numpy reference,
header metadata correctness, and bad-magic rejection."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.media import AudioFeatures, make_fake_audio


def _reference(rec: bytes):
    assert rec[:4] == b"FAUD"
    sr, n = np.frombuffer(rec, dtype=np.int32, count=2, offset=4)
    pcm = np.frombuffer(rec, dtype=np.int16, count=n, offset=12) \
        .astype(np.float64)
    s = np.signbit(pcm)
    return (int(sr), int(n), n / sr,
            float(np.sqrt(np.mean(pcm * pcm))),
            float(np.count_nonzero(s[1:] != s[:-1])) / (n - 1))


def test_audio_features_match_reference():
    ids = np.array([0, 1, 2, 3, 4, 17, 123], dtype=np.int64)
    audio = make_fake_audio(ids)
    batch = pa.table({
        "audio_id": pa.array([f"a{i}" for i in ids]),
        "audio": audio,
    })
    out = AudioFeatures()(batch)
    assert "audio" not in out.schema.names            # blob dropped map-side
    for i in range(len(ids)):
        sr, n, dur, rms, zcr = _reference(audio[i].as_py())
        assert out["sr"][i].as_py() == sr == 16_000
        assert out["n_samples"][i].as_py() == n == 8_000 + (ids[i] % 5) * 1_600
        assert out["duration_s"][i].as_py() == pytest.approx(dur)
        assert out["rms"][i].as_py() == pytest.approx(rms)
        assert out["zcr"][i].as_py() == pytest.approx(zcr)


def test_audio_features_empty_batch():
    batch = pa.table({"audio_id": pa.array([], type=pa.string()),
                      "audio": pa.array([], type=pa.large_binary())})
    out = AudioFeatures()(batch)
    assert out.num_rows == 0 and "rms" in out.schema.names


def test_audio_bad_magic_raises():
    batch = pa.table({"audio": pa.array([b"NOPE" + b"\0" * 100],
                                        type=pa.large_binary())})
    with pytest.raises(ValueError, match="magic"):
        AudioFeatures()(batch)


def test_audio_actor_stage(ray_session):
    import ray.data as rd

    ids = np.arange(0, 500, dtype=np.int64)
    tbl = pa.table({"audio_id": pa.array([f"a{i}" for i in ids]),
                    "audio": make_fake_audio(ids)})
    ds = rd.from_arrow(tbl).repartition(4)
    out = ds.map_batches(AudioFeatures, batch_size=128, concurrency=2,
                         batch_format="pyarrow")
    rows = out.take_all()
    assert len(rows) == 500
    durs = {r["audio_id"]: r["duration_s"] for r in rows}
    assert durs["a0"] == pytest.approx(0.5)
    assert durs["a3"] == pytest.approx((8_000 + 3 * 1_600) / 16_000)
