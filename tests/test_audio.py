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


def test_audio_segments_vs_numpy(ray_session):
    """AudioSegments vs a direct numpy segmentation of the same PCM:
    silence_win=500-framed fake audio alternates voiced/silent windows
    by (w + id) % 3 == 0, so segment boundaries are known exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.functions.hashing import hash64
    from osmium_tool_ray.stages.media import AudioSegments, make_fake_audio

    idx = np.array([3, 7, 12], dtype=np.int64)
    tbl = pa.table({
        "audio_id": pa.array([f"a{i:04d}" for i in idx]),
        "audio": make_fake_audio(idx, silence_win=500)})
    out = rd.from_arrow(tbl).map_batches(
        AudioSegments, fn_constructor_kwargs={"frame": 500,
                                              "threshold": 1000.0},
        batch_format="pyarrow", concurrency=1).take_all()
    got = {}
    for r in out:
        got.setdefault(r["audio_id"], []).append(
            (r["seg_no"], r["start_ms"], r["end_ms"], r["n_frames"]))
    for i in idx:
        n = int(8000 + (i % 5) * 1600)
        nwords = (n + 3) // 4
        words = hash64(np.int64(i) * np.int64(1_000_003)
                       + np.arange(nwords, dtype=np.int64))
        pcm = words.view(np.int16)[:n].astype(np.float64).copy()
        w = np.arange(n) // 500
        pcm[(w + i) % 3 == 0] = 0.0
        # numpy reference segmentation over 500-sample frames
        nf = -(-n // 500)
        voiced = []
        for f in range(nf):
            seg = pcm[f * 500:min((f + 1) * 500, n)]
            voiced.append(np.sqrt((seg * seg).mean()) >= 1000.0)
        expect, seg_no, f = [], 0, 0
        while f < nf:
            if voiced[f]:
                g = f
                while g + 1 < nf and voiced[g + 1]:
                    g += 1
                start = f * 500
                end = min((g + 1) * 500, n)
                expect.append((seg_no, start * 1000 // 16000,
                               end * 1000 // 16000, g - f + 1))
                seg_no += 1
                f = g + 1
            else:
                f += 1
        assert sorted(got[f"a{i:04d}"]) == expect, i
