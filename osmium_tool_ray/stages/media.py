"""Multimodal (image) stages: decode / verify / feature-extract / resize.

The binary `bytes` column is opaque payload; all Ray-side plumbing (schemas,
actor-pool signatures, batch sizing, output layout) is real. The codec is
the deterministic fake from functions/imagecodec (this container has no
image libraries — a real deployment swaps the codec functions for
PIL/libjpeg calls inside the same actor methods; `_load_codec` marks the
seam).

Batch-size guidance: payload rows are ~0.8 KB here but real images are MBs —
callers pass small batch_size (e.g. 64-256) for decode stages so
batch x concurrency fits worker heaps, and blobs NEVER enter a shuffle:
wide ops run on narrow projections and re-join by image_id at the sink
(SURVEY.md §7.0)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _load_codec():
    """Codec seam, import-gated like sources/readers.HAVE_LANCE: with PIL
    installed, functions/pilcodec decodes real PNG/JPEG bytes through PIL
    and still routes fake-magic records (the synthetic test corpus) to the
    deterministic fake codec by sniff; without PIL the fake codec serves
    everything."""
    from ..functions import pilcodec

    if pilcodec.HAVE_PIL:
        return pilcodec
    from ..functions import imagecodec
    return imagecodec


class DecodeVerify:
    """Actor stage: decode `bytes`, verify PSNR >= `min_psnr` dB against the
    deterministic source pixels (the per-row invariant from BASELINE.json
    input_hint), append `psnr_db` (inf -> large sentinel) and `pix_ok`."""

    def __init__(self, min_psnr: float = 40.0, bytes_col: str = "bytes",
                 id_col: str = "image_id"):
        self.codec = _load_codec()
        self.min_psnr = min_psnr
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        # "imgNNNNNNNNNN" -> int64, vectorized (no per-row Python parse)
        idx = pc.cast(pc.utf8_slice_codeunits(
            batch[self.id_col].cast(pa.string()), 3, 32), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        src = self.codec.gen_pixels(idx, int(w[0]) if len(w) else 16,
                                    int(h[0]) if len(h) else 16)
        p = self.codec.psnr(src, pix) if len(idx) else np.empty(0)
        p = np.minimum(p, 99.0)
        return batch.append_column("psnr_db", pa.array(p)) \
                    .append_column("pix_ok", pa.array(p >= self.min_psnr))


class ExtractFeatures:
    """Actor stage: cheap pixel features (mean/std per channel + phash
    recompute) — the batched-model-inference shape with numpy in place of a
    model forward pass."""

    def __init__(self, bytes_col: str = "bytes"):
        self.codec = _load_codec()
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        if pix.size == 0:
            mean = std = np.empty(0)
        else:
            f = pix.astype(np.float64)
            mean = f.mean(axis=1)
            std = f.std(axis=1)
        return batch.append_column("pix_mean", pa.array(mean)) \
                    .append_column("pix_std", pa.array(std))


def make_fake_videos(idx: np.ndarray, n_frames: int = 6, w: int = 8,
                     h: int = 8, scene_len: int = 1) -> pa.Array:
    """Deterministic fake video container: `n_frames` equal-size encoded
    frames (fake-png records) back-to-back per video. Frame f of video i
    holds gen_pixels(i * 1000 + f // scene_len) — byte-stable, so
    frame-sampling pipelines can verify content; scene_len > 1 repeats
    each generated frame scene_len times (static scenes with hard cuts
    between them, for scene-cut detection)."""
    from ..functions import imagecodec

    idx = np.asarray(idx, dtype=np.int64)
    frames = []
    for f in range(n_frames):
        pix = imagecodec.gen_pixels(idx * 1000 + f // scene_len, w, h)
        frames.append(imagecodec.encode_batch(
            pix, np.full(len(idx), "png"), w, h))
    recs = [b"".join(frames[f][i].as_py() for f in range(n_frames))
            for i in range(len(idx))]
    return pa.array(recs, type=pa.large_binary())


class FrameSample:
    """Actor stage: sample every `stride`-th frame from a video byte stream
    (equal-size encoded frame records back-to-back, the fake container
    above) — one OUTPUT ROW PER SAMPLED FRAME, the video->frames explode
    of a real training pipeline. REAL containers (anything without the
    fake-frame magic) decode per record through PyAV when installed
    (functions/avcodec seam, skipif-gated pytest); decoded frames
    re-encode into the deterministic fake-png records so downstream
    pixel stages consume both sources identically. Fake-container frame
    bytes are sliced, not re-encoded — memcpy only."""

    def __init__(self, stride: int = 2, bytes_col: str = "video",
                 id_col: str = "video_id"):
        from ..functions import imagecodec
        self.codec = imagecodec
        self.stride = stride
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.imagecodec import HEADER_LEN, MAGIC

        fake_magics = tuple(MAGIC.values())
        arr = batch[self.bytes_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        arr = arr.cast(pa.large_binary())
        ids = batch[self.id_col].to_pylist()
        out_id, out_frame, out_bytes, out_w, out_h = [], [], [], [], []
        buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        for i in range(len(arr)):
            start, end = int(offs[i]), int(offs[i + 1])
            if end - start < HEADER_LEN:
                continue
            if buf[start:start + 4].tobytes() not in fake_magics:
                # real container: PyAV decode (avcodec seam), frames
                # re-encoded as fake-png records
                from ..functions import avcodec

                w, h, frames = avcodec.decode_video_record(
                    buf[start:end].tobytes(), stride=self.stride)
                if frames:
                    pix = np.stack([p for _, p in frames])
                    recs = self.codec.encode_batch(
                        pix, np.full(len(frames), "png"), w, h)
                    for (fno, _), rec in zip(frames, recs.to_pylist()):
                        out_id.append(ids[i])
                        out_frame.append(fno)
                        out_bytes.append(rec)
                        out_w.append(w)
                        out_h.append(h)
                continue
            w = int(buf[start + 4] | (buf[start + 5] << 8))
            h = int(buf[start + 6] | (buf[start + 7] << 8))
            rec_len = HEADER_LEN + w * h * 3
            n_frames = (end - start) // rec_len
            for f in range(0, n_frames, self.stride):
                s = start + f * rec_len
                out_id.append(ids[i])
                out_frame.append(f)
                out_bytes.append(buf[s:s + rec_len].tobytes())
                out_w.append(w)
                out_h.append(h)
        return pa.table({
            self.id_col: pa.array(out_id),
            "frame_no": pa.array(out_frame, type=pa.int32()),
            "bytes": pa.array(out_bytes, type=pa.large_binary()),
            "w": pa.array(out_w, type=pa.int32()),
            "h": pa.array(out_h, type=pa.int32()),
        })


class Resize:
    """Actor stage: nearest-neighbor resize of the fake-codec pixel grid —
    stands in for a real resize kernel; output re-encoded with the same
    format column."""

    def __init__(self, out_w: int = 8, out_h: int = 8, bytes_col: str = "bytes",
                 fmt_col: str = "fmt"):
        self.codec = _load_codec()
        self.out_w, self.out_h = out_w, out_h
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n = len(w)
        if n == 0:
            return batch
        W, H = int(w[0]), int(h[0])
        img = pix.reshape(n, H, W, 3)
        ys = (np.arange(self.out_h) * H // self.out_h)
        xs = (np.arange(self.out_w) * W // self.out_w)
        small = img[:, ys][:, :, xs].reshape(n, -1)
        fmts = np.asarray(batch[self.fmt_col].to_pylist())
        enc = self.codec.encode_batch(small, fmts, self.out_w, self.out_h)
        batch = batch.set_column(batch.schema.get_field_index(self.bytes_col),
                                 self.bytes_col, enc)
        batch = batch.set_column(batch.schema.get_field_index("w"), "w",
                                 pa.array(np.full(n, self.out_w, dtype=np.int32)))
        return batch.set_column(batch.schema.get_field_index("h"), "h",
                                pa.array(np.full(n, self.out_h, dtype=np.int32)))


_AUDIO_MAGIC = b"FAUD"


def make_fake_audio(idx: np.ndarray, sr: int = 16_000,
                    base_samples: int = 8_000, step: int = 1_600,
                    silence_win: int = 0) -> pa.Array:
    """Deterministic fake audio container (the ffmpeg/soundfile seam,
    like the fake image/video codecs): header = magic + sr(int32) +
    n_samples(int32), body = int16 PCM derived from splitmix64 of
    (id, sample_block). n_samples = base + (id % 5) * step, so duration
    is an arithmetic function of the id — SQL-oracle-checkable.
    silence_win > 0 zeroes every `silence_win`-sample window whose index
    w satisfies (w + id) % 3 == 0 — deterministic speech/silence
    alternation for segmentation pipelines."""
    from ..functions.hashing import hash64

    idx = np.asarray(idx, dtype=np.int64)
    out = []
    for i in idx:
        n = int(base_samples + (i % 5) * step)
        nwords = (n + 3) // 4                   # 4 int16 per u64 word
        words = hash64(np.int64(i) * np.int64(1_000_003)
                       + np.arange(nwords, dtype=np.int64))
        pcm = words.view(np.int16)[:n].copy()
        if silence_win > 0:
            w = np.arange(n) // silence_win
            pcm[(w + i) % 3 == 0] = 0
        hdr = (_AUDIO_MAGIC
               + np.array([sr, n], dtype=np.int32).tobytes())
        out.append(hdr + pcm.tobytes())
    return pa.array(out, type=pa.large_binary())


class AudioFeatures:
    """Actor stage: parse the audio container and append per-row
    features — sample rate, sample count, duration_s, RMS amplitude and
    zero-crossing rate. Header fields are metadata (SQL-checkable);
    RMS/ZCR are computed from the PCM body (pytest-checked vs numpy).

    Container dispatch (the functions/avcodec seam): fake-magic records
    decode via the vectorized flat-buffer path; REAL audio bytes decode
    per record through soundfile (or the stdlib-wave PCM16 fallback) —
    pytest round-trips a real WAV through this path. Mixed fake/real
    batches raise (upstream readers keep formats per-partition, the
    pilcodec contract).

    Decode state (none for the fake codec; a resampler/filterbank for a
    real one) lives in __init__ — once per actor, not per batch. Blobs
    never leave the map task: output is the input minus the audio bytes
    plus 5 scalar columns."""

    def __init__(self, bytes_col: str = "audio"):
        self.bytes_col = bytes_col

    @staticmethod
    def _feats(batch, bytes_col, pcm: np.ndarray, ns: np.ndarray,
               srs: np.ndarray) -> pa.Table:
        """Vectorized RMS/ZCR over ONE flat float64 PCM vector with
        per-record segment bounds (shared by the fake and real paths)."""
        bounds = np.concatenate([[0], np.cumsum(ns.astype(np.int64))])
        sq_sums = np.add.reduceat(pcm * pcm, bounds[:-1])
        rms = np.sqrt(sq_sums / ns)
        sb = np.signbit(pcm)
        flips = (sb[1:] != sb[:-1]).astype(np.int64)
        # zero out flips that straddle record boundaries
        flips[bounds[1:-1] - 1] = 0
        cum = np.concatenate([[0], np.cumsum(flips)])
        per_rec = cum[np.minimum(bounds[1:] - 1, len(cum) - 1)] \
            - cum[bounds[:-1]]
        zcr = per_rec / np.maximum(ns - 1, 1)
        out = batch.drop_columns([bytes_col])
        return out.append_column("sr", pa.array(srs, type=pa.int32())) \
            .append_column("n_samples",
                           pa.array(ns.astype(np.int32), type=pa.int32())) \
            .append_column("duration_s",
                           pa.array(ns.astype(np.float64) / srs)) \
            .append_column("rms", pa.array(rms)) \
            .append_column("zcr", pa.array(zcr))

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.bytes_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.large_binary())
        nrec = len(col)
        if nrec == 0:
            out = batch.drop_columns([self.bytes_col])
            return out.append_column("sr", pa.array([], type=pa.int32())) \
                .append_column("n_samples", pa.array([], type=pa.int32())) \
                .append_column("duration_s", pa.array([], type=pa.float64())) \
                .append_column("rms", pa.array([], type=pa.float64())) \
                .append_column("zcr", pa.array([], type=pa.float64()))
        # segmented decode over the flat value buffer — no per-row Python
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset:col.offset + nrec + 1]
        starts = offs[:-1]
        magic = buf[(starts[:, None] + np.arange(4)[None, :]).ravel()] \
            .reshape(-1, 4)
        fake = (magic == np.frombuffer(_AUDIO_MAGIC,
                                       dtype=np.uint8)).all(axis=1)
        if not fake.all():
            if fake.any():
                raise ValueError(
                    "mixed fake/real audio records in one batch")
            # real audio bytes: per-record codec calls (avcodec seam),
            # then the same vectorized feature fold
            from ..functions import avcodec

            srs_l, pcms = [], []
            for rec in col.to_pylist():
                sr, p = avcodec.decode_audio_record(rec)
                srs_l.append(sr)
                pcms.append(p)
            srs = np.asarray(srs_l, dtype=np.int32)
            ns = np.asarray([len(p) for p in pcms], dtype=np.int64)
            pcm = (np.concatenate(pcms).astype(np.float64) if ns.sum()
                   else np.empty(0, np.float64))
            return self._feats(batch, self.bytes_col, pcm, ns, srs)
        hdr_idx = (starts[:, None] + 4 + np.arange(8)[None, :]).ravel()
        hdr = buf[hdr_idx].reshape(-1, 8).copy().view(np.int32)
        srs, ns = hdr[:, 0].copy(), hdr[:, 1].copy()
        # gather all PCM segments into one flat float64 vector
        seg_starts = starts + 12
        seg_len_b = (ns.astype(np.int64)) * 2
        flat_idx = np.concatenate(
            [np.arange(s, s + l) for s, l in zip(seg_starts, seg_len_b)])
        pcm = buf[flat_idx].copy().view(np.int16).astype(np.float64)
        return self._feats(batch, self.bytes_col, pcm, ns, srs)


class Augment:
    """Actor stage: deterministic image augmentation — horizontal flip
    and/or center crop on the decoded pixel grid, re-encoded in place
    (the training-data augmentation shape: decode -> transform ->
    encode inside one map task, blobs never leave it). `mode` is
    'hflip' (involution: applying twice restores the bytes for lossless
    rows), 'crop' (center crop to crop_w x crop_h), or 'hflip+crop'.

    Determinism: the transform is a pure function of the pixels — no
    RNG — so retries and re-runs are byte-stable, same as every other
    stage."""

    def __init__(self, mode: str = "hflip", crop_w: int = 8,
                 crop_h: int = 8, bytes_col: str = "bytes",
                 fmt_col: str = "fmt"):
        if mode not in ("hflip", "crop", "hflip+crop"):
            raise ValueError(f"unknown augment mode: {mode}")
        self.codec = _load_codec()
        self.mode = mode
        self.crop_w, self.crop_h = crop_w, crop_h
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n = len(w)
        if n == 0:
            return batch
        W, H = int(w[0]), int(h[0])
        img = pix.reshape(n, H, W, 3)
        if "hflip" in self.mode:
            img = img[:, :, ::-1, :]
        out_w, out_h = W, H
        if "crop" in self.mode:
            out_w, out_h = self.crop_w, self.crop_h
            y0 = (H - out_h) // 2
            x0 = (W - out_w) // 2
            img = img[:, y0:y0 + out_h, x0:x0 + out_w, :]
        flat = np.ascontiguousarray(img).reshape(n, -1)
        fmts = np.asarray(batch[self.fmt_col].to_pylist())
        enc = self.codec.encode_batch(flat, fmts, out_w, out_h)
        batch = batch.set_column(
            batch.schema.get_field_index(self.bytes_col),
            self.bytes_col, enc)
        batch = batch.set_column(
            batch.schema.get_field_index("w"), "w",
            pa.array(np.full(n, out_w, dtype=np.int32)))
        return batch.set_column(
            batch.schema.get_field_index("h"), "h",
            pa.array(np.full(n, out_h, dtype=np.int32)))


class SceneCut:
    """Actor stage: hard-cut detection over the fake video container —
    per consecutive frame pair, the mean absolute pixel difference and a
    cut flag when it exceeds `threshold`. One output row per frame pair
    (the shot-boundary explode of a video curation pipeline). A real
    deployment swaps the record slicing + raw diff for an ffmpeg decode
    + histogram distance inside the same actor method; the Ray-side
    shape (binary in, per-pair rows out, small batch_size) is real.

    Fully vectorized for the uniform-geometry batch (one reshape +
    int16 diff across the frame axis); mixed geometries fall back to a
    per-video slice loop."""

    def __init__(self, threshold: float = 16.0, bytes_col: str = "video",
                 id_col: str = "video_id"):
        self.threshold = threshold
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.imagecodec import HEADER_LEN

        empty = pa.table({
            self.id_col: pa.array([], type=pa.string()),
            "frame_no": pa.array([], type=pa.int32()),
            "diff": pa.array([], type=pa.float64()),
            "is_cut": pa.array([], type=pa.bool_()),
        })
        arr = batch[self.bytes_col]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        arr = arr.cast(pa.large_binary())
        if len(arr) == 0:
            return empty
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=str)
        buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + len(arr) + 1]
        lens = np.diff(offs)
        if not (lens == lens[0]).all() or lens[0] < HEADER_LEN:
            raise ValueError("SceneCut expects uniform video records per batch")
        w = int(buf[offs[0] + 4] | (buf[offs[0] + 5] << 8))
        h = int(buf[offs[0] + 6] | (buf[offs[0] + 7] << 8))
        rec_len = HEADER_LEN + w * h * 3
        n_frames = int(lens[0]) // rec_len
        if n_frames < 2:
            return empty
        # (videos, frames, rec_len) view; drop headers -> pixel cube
        base = offs[:-1][:, None, None] \
            + np.arange(n_frames)[None, :, None] * rec_len \
            + np.arange(rec_len)[None, None, :]
        cube = buf[base][:, :, HEADER_LEN:].astype(np.int16)
        d = np.abs(np.diff(cube, axis=1)).mean(axis=2)   # (videos, n-1)
        frames = np.tile(np.arange(1, n_frames, dtype=np.int32),
                         len(arr))
        diffs = d.reshape(-1)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, n_frames - 1),
                                  type=pa.string()),
            "frame_no": pa.array(frames),
            "diff": pa.array(diffs),
            "is_cut": pa.array(diffs > self.threshold),
        })


class AudioSegments:
    """Actor stage: voice-activity segmentation — frame the PCM into
    `frame` -sample windows, score per-frame RMS with one reduceat over
    the batch's flat buffer, and merge consecutive voiced frames
    (rms >= threshold) into segments. One output row per segment:
    (id_col, seg_no:int32, start_ms:int64, end_ms:int64,
    n_frames:int32). The speech-segmentation explode of an ASR data
    pipeline; a real deployment swaps the RMS gate for a VAD model
    forward pass inside the same actor method.

    Fully vectorized across records: frame boundaries never straddle a
    record (frames are cut per record), segment starts/ends come from
    one flatnonzero over the voiced-transition mask."""

    def __init__(self, frame: int = 500, threshold: float = 1000.0,
                 bytes_col: str = "audio", id_col: str = "audio_id"):
        self.frame, self.threshold = frame, threshold
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            self.id_col: pa.array([], type=pa.string()),
            "seg_no": pa.array([], type=pa.int32()),
            "start_ms": pa.array([], type=pa.int64()),
            "end_ms": pa.array([], type=pa.int64()),
            "n_frames": pa.array([], type=pa.int32()),
        })
        col = batch[self.bytes_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.large_binary())
        nrec = len(col)
        if nrec == 0:
            return empty
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=str)
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset:col.offset + nrec + 1]
        starts = offs[:-1]
        hdr_idx = (starts[:, None] + 4 + np.arange(8)[None, :]).ravel()
        hdr = buf[hdr_idx].reshape(-1, 8).copy().view(np.int32)
        srs, ns = hdr[:, 0].astype(np.int64), hdr[:, 1].astype(np.int64)
        seg_starts = starts + 12
        flat_idx = np.concatenate(
            [np.arange(s, s + n * 2) for s, n in zip(seg_starts, ns)])
        pcm = buf[flat_idx].copy().view(np.int16).astype(np.float64)
        rec_bounds = np.concatenate([[0], np.cumsum(ns)])
        # frames cut per record: ceil(n/frame) frames each
        f_per_rec = -(-ns // self.frame)
        total_f = int(f_per_rec.sum())
        frec = np.repeat(np.arange(nrec), f_per_rec)       # frame -> record
        fi = np.arange(total_f) - np.repeat(
            np.cumsum(f_per_rec) - f_per_rec, f_per_rec)   # frame idx in rec
        fstart = rec_bounds[frec] + fi * self.frame
        fend = np.minimum(fstart + self.frame, rec_bounds[frec + 1])
        sq = np.add.reduceat(pcm * pcm, fstart) \
            if len(pcm) else np.zeros(total_f)
        rms = np.sqrt(sq / np.maximum(fend - fstart, 1))
        voiced = rms >= self.threshold
        # segment starts: voiced frame whose predecessor is unvoiced or
        # belongs to another record
        prev_v = np.concatenate([[False], voiced[:-1]])
        prev_rec = np.concatenate([[-1], frec[:-1]])
        seg_start_f = np.flatnonzero(voiced & (~prev_v
                                               | (prev_rec != frec)))
        if not len(seg_start_f):
            return empty
        next_v = np.concatenate([voiced[1:], [False]])
        next_rec = np.concatenate([frec[1:], [-1]])
        seg_end_f = np.flatnonzero(voiced & (~next_v | (next_rec != frec)))
        rec_of = frec[seg_start_f]
        # per-record 0-based segment numbering (vectorized run reset)
        new_rec = np.ones(len(rec_of), dtype=bool)
        new_rec[1:] = rec_of[1:] != rec_of[:-1]
        first_idx = np.maximum.accumulate(
            np.where(new_rec, np.arange(len(rec_of)), 0))
        seg_no = (np.arange(len(rec_of)) - first_idx).astype(np.int32)
        sr_of = srs[rec_of]
        start_samp = fi[seg_start_f] * self.frame
        end_samp = np.minimum((fi[seg_end_f] + 1) * self.frame, ns[rec_of])
        return pa.table({
            self.id_col: pa.array(ids[rec_of], type=pa.string()),
            "seg_no": pa.array(seg_no),
            "start_ms": pa.array(start_samp * 1000 // sr_of),
            "end_ms": pa.array(end_samp * 1000 // sr_of),
            "n_frames": pa.array((seg_end_f - seg_start_f + 1)
                                 .astype(np.int32)),
        })


class ContentHash:
    """Actor stage: format-invariant image content hash — decode,
    canonicalize to the lossy codec's quantization grid, and fold each
    pixel row to one 64-bit key with a vectorized splitmix chain over
    uint64 words. A PNG and its JPEG re-encode of the same pixels hash
    EQUAL (both land on the quantized grid); any pixel edit diverges.
    The image-side twin of text.Fingerprint. Blobs stay map-side; only
    the (id, content_hash) projection ever shuffles."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 quantize: bool = True):
        self.codec = _load_codec()
        self.bytes_col, self.id_col = bytes_col, id_col
        self.quantize = quantize

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import splitmix64
        from ..functions.imagecodec import _quantize

        if batch.num_rows == 0:
            return pa.table({self.id_col: batch[self.id_col],
                             "content_hash": pa.array([], type=pa.int64())})
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        q = _quantize(pix) if self.quantize else pix
        n, k = q.shape
        pad = (-k) % 8
        if pad:
            q = np.concatenate(
                [q, np.zeros((n, pad), dtype=np.uint8)], axis=1)
        words = np.ascontiguousarray(q).view(np.uint64)
        # seed folds the dimensions so equal pixels at different shapes
        # (or a resized copy) never collide
        acc = splitmix64((w.astype(np.uint64) << np.uint64(32))
                         ^ h.astype(np.uint64)
                         ^ np.uint64(0x6A09E667F3BCC909))
        with np.errstate(over="ignore"):
            for j in range(words.shape[1]):
                acc = splitmix64(acc ^ words[:, j])
        return pa.table({self.id_col: batch[self.id_col],
                         "content_hash": pa.array(acc.view(np.int64))})


def content_dup_images(images, bytes_col: str = "bytes",
                       id_col: str = "image_id", quantize: bool = True,
                       buckets: int | None = None):
    """Exact content-level image dedup across format re-encodes: hash
    the canonicalized decoded pixels map-side (ContentHash), then ONE
    int-key hash shuffle of the narrow (id, content_hash) rows into
    hash%buckets groups; inside a bucket a single lexsort + run-length
    pass keeps the min-id member of every content group and emits the
    rest as (image_id, dup_of) — per-hash map_groups at web-scale
    cardinality would pay per-group overhead (most hashes are unique).

    Returns (image_id, dup_of) for dropped members only."""
    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))

    # stateless fused task: ContentHash's only state is the codec module
    # (a cached import) — a fixed-size actor pool here would reserve its
    # CPUs for the whole pipeline (CLAUDE.md pool-reservation landmine)
    # and cap the decode+hash pass at `concurrency` workers
    kw = {"bytes_col": bytes_col, "id_col": id_col, "quantize": quantize}

    def _hash_batch(batch: pa.Table) -> pa.Table:
        return ContentHash(**kw)(batch)

    hashed = images.map_batches(_hash_batch, batch_format="pyarrow") \
        .select_columns([id_col, "content_hash"])

    def bucket(batch: pa.Table) -> pa.Table:
        b = (batch["content_hash"].to_numpy(zero_copy_only=False)
             .view(np.uint64) % np.uint64(buckets)).astype(np.int32)
        return batch.append_column("_b", pa.array(b))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.string()),
                          "dup_of": pa.array([], type=pa.string())})
        if g.num_rows == 0 or "content_hash" not in g.schema.names:
            return empty
        ch = g["content_hash"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((ids, ch))
        hs, sid = ch[order], ids[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        # dup rows: every non-first member of a run; dup_of = run head
        head = np.maximum.accumulate(
            np.where(first, np.arange(len(hs)), 0))
        dup = ~first
        if not dup.any():
            return empty
        return pa.table({id_col: pa.array(sid[dup]),
                         "dup_of": pa.array(sid[head[dup]])})

    return hashed.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")


class ImageQuality:
    """Per-image quality statistics over decoded pixels — per-channel
    means, global contrast (std), byte entropy in bits, and the
    standard curation flags (too_dark / too_bright / low_contrast /
    low_entropy): the image twin of text.QualityScore (C4/Gopher-style
    threshold filters, pixel edition). Fully vectorized: one decode,
    channel means by reshape, per-image 256-bin histograms via a single
    offset bincount — no per-row Python. Stateless-safe (codec module
    import is the only state)."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id",
                 dark: float = 48.0, bright: float = 208.0,
                 min_contrast: float = 12.0, min_entropy: float = 3.0):
        self.codec = _load_codec()
        self.bytes_col, self.id_col = bytes_col, id_col
        self.dark, self.bright = dark, bright
        self.min_contrast, self.min_entropy = min_contrast, min_entropy

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            z = pa.array([], type=pa.float64())
            return pa.table({self.id_col: batch[self.id_col],
                             "mean_r": z, "mean_g": z, "mean_b": z,
                             "contrast": z, "entropy_bits": z,
                             "quality_ok": pa.array([], type=pa.bool_())})
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n, k = pix.shape
        # exact means from integer channel sums (pixel sums < 2^53, so
        # the float64 division equals the naive float mean bit-for-bit)
        csum = pix.reshape(n, -1, 3).sum(axis=1, dtype=np.int64)
        means = csum / (k // 3)                       # (n, 3)
        contrast = pix.astype(np.float64).std(axis=1)
        # per-image byte histogram: one bincount over offset values
        offset = (np.arange(n, dtype=np.int32)[:, None] * np.int32(256)
                  + pix.astype(np.int32)).reshape(-1)
        hist = np.bincount(offset, minlength=n * 256).reshape(n, 256)
        # bin counts are bounded by k, so p*log2(p) comes from a (k+1)-
        # entry LUT gather instead of 256 float log2s per image — the
        # values are identical (p = c/k exactly), only cheaper
        c = np.arange(k + 1, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            plogp = np.where(c > 0, (c / k) * np.log2(c / k), 0.0)
        ent = -plogp.take(hist).sum(axis=1)
        lum = means.mean(axis=1)
        ok = ((lum >= self.dark) & (lum <= self.bright)
              & (contrast >= self.min_contrast)
              & (ent >= self.min_entropy))
        return pa.table({
            self.id_col: batch[self.id_col],
            "mean_r": pa.array(means[:, 0]),
            "mean_g": pa.array(means[:, 1]),
            "mean_b": pa.array(means[:, 2]),
            "contrast": pa.array(contrast),
            "entropy_bits": pa.array(ent),
            "quality_ok": pa.array(ok),
        })


def sniff_image_meta(images, bytes_col: str = "bytes",
                     id_col: str = "image_id"):
    """Header-only metadata sniff — fmt / width / height / record size
    parsed from the first HEADER_LEN bytes WITHOUT decoding pixels (the
    metadata-scan fast path: at corpus scale a schema/stats pass that
    touches 8 bytes per record instead of the full payload is the
    difference between minutes and hours; fileinfo's analogue for the
    blob column). Vectorized: one Arrow binary_slice + numpy header
    parse per batch. Returns (id, fmt_sniffed, w, h, rec_bytes)."""
    import pyarrow.compute as pc

    from ..functions.imagecodec import _MAGIC_REV, HEADER_LEN

    magic_map = {m: f for m, f in _MAGIC_REV.items()}

    def sniff(batch: pa.Table) -> pa.Table:
        col = batch[bytes_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        n = len(col)
        if n == 0:
            return pa.table({id_col: batch[id_col],
                             "fmt_sniffed": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.int32()),
                             "h": pa.array([], type=pa.int32()),
                             "rec_bytes": pa.array([], type=pa.int64())})
        total = pc.binary_length(col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        heads = pc.binary_slice(col.cast(pa.large_binary()), 0, HEADER_LEN)
        hb = np.frombuffer(b"".join(heads.to_pylist()), dtype=np.uint8) \
            .reshape(n, HEADER_LEN)
        fmts = np.full(n, "unknown", dtype=object)
        for magic, fmt in magic_map.items():
            m = np.frombuffer(magic, dtype=np.uint8)
            fmts[(hb[:, :4] == m).all(axis=1)] = fmt
        w = hb[:, 4:6].copy().view(np.uint16).astype(np.int32).ravel()
        h = hb[:, 6:8].copy().view(np.uint16).astype(np.int32).ravel()
        return pa.table({id_col: batch[id_col],
                         "fmt_sniffed": pa.array(fmts, type=pa.string()),
                         "w": pa.array(w),
                         "h": pa.array(h),
                         "rec_bytes": pa.array(total)})

    return images.map_batches(sniff, batch_format="pyarrow")


class Equalize:
    """Actor stage: per-image histogram equalization over the decoded
    luminance-free per-channel grid (the classic contrast-normalization
    curation transform). remap(v) = floor(cdf(v) * 255 / n_pixels) with
    cdf the per-image per-channel cumulative histogram — the textbook
    integer form, deterministic, no float.

    Vectorized across the whole batch: ONE (n*3, 256) offset-bincount
    builds every per-image per-channel histogram (the image_quality
    trick), cumsum along axis 1 gives all CDFs, and a gather remaps all
    pixels — no per-image Python. decode -> equalize -> encode inside
    one map task; blobs never leave it.

    Emits the re-encoded bytes plus per-image min/max luminance-proxy
    spread before and after (spread = max - min over all channels) so
    the contrast gain is queryable without another decode."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt"):
        self.codec = _load_codec()
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n = len(w)
        if n == 0:
            return batch
        W, H = int(w[0]), int(h[0])
        npx = W * H
        chan = pix.reshape(n, npx, 3).transpose(0, 2, 1) \
            .reshape(n * 3, npx)                 # (n*3, npx)
        ids = np.arange(n * 3, dtype=np.int32)[:, None]
        # ONE offset-index array drives both the histogram bincount and
        # the remap gather (int32 throughout: 2x the int64 throughput,
        # and n*3*256 per batch is far below 2^31)
        flat = (ids * np.int32(256) + chan.astype(np.int32)).ravel()
        hist = np.bincount(flat, minlength=n * 3 * 256) \
            .astype(np.int32).reshape(n * 3, 256)
        cdf = np.cumsum(hist, axis=1, dtype=np.int32)
        if npx == 256:                           # common square case
            lut = (cdf * np.int32(255)) >> np.int32(8)
        else:
            lut = (cdf * np.int32(255)) // np.int32(npx)
        eq = lut.ravel().take(flat).astype(np.uint8) \
            .reshape(n * 3, npx)                 # gather remap
        out = eq.reshape(n, 3, npx).transpose(0, 2, 1).reshape(n, -1)
        fmts = np.asarray(batch[self.fmt_col].to_pylist())
        enc = self.codec.encode_batch(np.ascontiguousarray(out), fmts,
                                      W, H)
        spread_before = (pix.max(axis=1).astype(np.int64)
                         - pix.min(axis=1))
        spread_after = (out.max(axis=1).astype(np.int64)
                        - out.min(axis=1))
        batch = batch.set_column(
            batch.schema.get_field_index(self.bytes_col),
            self.bytes_col, enc)
        return batch \
            .append_column("spread_before", pa.array(spread_before)) \
            .append_column("spread_after", pa.array(spread_after))


class Patchify:
    """Actor stage: split each image into non-overlapping P x P patches
    (the ViT patch-extraction op) — one OUTPUT ROW PER PATCH with
    (image_id, patch_id, patch row-major position, patch bytes as raw
    RGB). Row explosion of binary payloads: a batch of B images becomes
    B * (W/P) * (H/P) rows, so callers size batch_size with the
    explosion factor in mind (the multimodal blob discipline — patches
    are produced and consumed map-side, never shuffled).

    Fully vectorized: one reshape/transpose builds every patch of the
    batch at once."""

    def __init__(self, patch: int = 8, id_col: str = "image_id",
                 bytes_col: str = "bytes"):
        self.codec = _load_codec()
        self.patch = patch
        self.id_col, self.bytes_col = id_col, bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({self.id_col: pa.array([], type=pa.string()),
                          "patch_id": pa.array([], type=pa.int64()),
                          "px": pa.array([], type=pa.int64()),
                          "py": pa.array([], type=pa.int64()),
                          "patch": pa.array([], type=pa.binary())})
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n = len(w)
        if n == 0:
            return empty
        W, H, P = int(w[0]), int(h[0]), self.patch
        if W % P or H % P:
            raise ValueError(f"patch {P} must divide image {W}x{H}")
        gx, gy = W // P, H // P
        img = pix.reshape(n, H, W, 3)
        # (n, gy, P, gx, P, 3) -> (n, gy, gx, P, P, 3)
        patches = img.reshape(n, gy, P, gx, P, 3) \
            .transpose(0, 1, 3, 2, 4, 5) \
            .reshape(n * gy * gx, P * P * 3)
        patches = np.ascontiguousarray(patches)
        ids = np.repeat(np.asarray(batch[self.id_col].to_pylist(),
                                   dtype=object), gy * gx)
        pid = np.tile(np.arange(gy * gx, dtype=np.int64), n)
        pbytes = pa.Array.from_buffers(
            pa.binary(P * P * 3), len(patches),
            [None, pa.py_buffer(patches.tobytes())]).cast(pa.binary())
        return pa.table({self.id_col: pa.array(ids.tolist(),
                                               type=pa.string()),
                         "patch_id": pa.array(pid),
                         "px": pa.array(pid % gx),
                         "py": pa.array(pid // gx),
                         "patch": pbytes})


class Sharpness:
    """Per-image blur / letterbox curation signals over decoded pixels —
    the focus-and-framing twin of ImageQuality:

    - `sharpness`: variance of the 4-neighbour Laplacian of the summed-
      channel luminance over interior pixels (the classic variance-of-
      Laplacian blur detector, Pech-Pacheco et al. 2000). Blurred or
      constant images score near 0.
    - `border_top/bottom/left/right`: run lengths of edge rows/columns
      uniformly equal to the adjacent corner pixel (letterbox /
      pillarbox bars); `letterboxed` flags any nonzero bar short of the
      whole image.

    Fully vectorized across the batch: the Laplacian is four shifted
    subtractions on the (n, H, W) int32 luminance grid and the border
    runs are cumprods of row/column uniformity masks — no per-image
    Python. Stateless-safe (codec module import is the only state)."""

    def __init__(self, bytes_col: str = "bytes",
                 id_col: str = "image_id"):
        self.codec = _load_codec()
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            z = pa.array([], type=pa.float64())
            zi = pa.array([], type=pa.int64())
            return pa.table({self.id_col: batch[self.id_col],
                             "sharpness": z, "border_top": zi,
                             "border_bottom": zi, "border_left": zi,
                             "border_right": zi,
                             "letterboxed": pa.array([],
                                                     type=pa.bool_())})
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n = len(w)
        W, H = int(w[0]), int(h[0])
        img = pix.reshape(n, H, W, 3)
        lum = img.astype(np.int32).sum(axis=3)          # (n, H, W)
        core = lum[:, 1:-1, 1:-1]
        lap = (4 * core - lum[:, :-2, 1:-1] - lum[:, 2:, 1:-1]
               - lum[:, 1:-1, :-2] - lum[:, 1:-1, 2:]) \
            .reshape(n, -1).astype(np.float64)
        sharp = lap.var(axis=1)

        def run(mask):                                   # (n, k) bool
            return np.cumprod(mask, axis=1).sum(axis=1).astype(np.int64)

        tl = img[:, :1, :1, :]                           # (n,1,1,3)
        br = img[:, -1:, -1:, :]
        row_u_t = (img == tl).all(axis=(2, 3))           # (n, H)
        row_u_b = (img == br).all(axis=(2, 3))[:, ::-1]
        col_u_l = (img == tl).all(axis=(1, 3))           # (n, W)
        col_u_r = (img == br).all(axis=(1, 3))[:, ::-1]
        top, bot = run(row_u_t), run(row_u_b)
        left, right = run(col_u_l), run(col_u_r)
        boxed = ((top + bot > 0) & (top < H) & (bot < H)) \
            | ((left + right > 0) & (left < W) & (right < W))
        return pa.table({self.id_col: batch[self.id_col],
                         "sharpness": pa.array(sharp),
                         "border_top": pa.array(top),
                         "border_bottom": pa.array(bot),
                         "border_left": pa.array(left),
                         "border_right": pa.array(right),
                         "letterboxed": pa.array(boxed)})


class DominantColors:
    """Per-image dominant-color palette — the color-quantization
    curation signal (duplicate-flagging by palette, monochrome/clipart
    detection): pixels quantize to 12-bit RGB (4 bits per channel) and
    the top-`k` quantized colors are returned with their exact coverage
    fractions.

    Vectorized with temporaries proportional to PIXELS, not bins: a
    per-row in-place sort of the quantized codes turns each image into
    contiguous runs; run boundaries + lengths come from one diff, and
    `k` segmented-argmax passes (`np.maximum.reduceat` over an int32
    (count desc, code asc) composite key, one equality sweep per pass)
    pick the top `k` runs per row. Two earlier forms lost to memory
    contention at 16 concurrent workers: a 4096-bin offset-bincount
    (50 KB of zeroed histogram per ROW — page-zero/TLB churn, 2.4x
    ANTI-scaling) and a global composite-key `argsort` over all runs
    (noise images have ~one run per pixel, so the argsort touched
    ~n*npx int64 keys with random access — measured 2.15x per-task
    inflation at 16-way; the reduceat passes are sequential int32
    sweeps and inflate ~1x). Ties rank by smaller color code; rows
    with fewer than `k` distinct colors pad with the smallest ABSENT
    codes at count 0 (the exact order the full-histogram ranking
    produced). Coverage fractions are exact int/int float64 divisions."""

    def __init__(self, k: int = 4, bytes_col: str = "bytes",
                 id_col: str = "image_id"):
        self.codec = _load_codec()
        self.k = k
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        if batch.num_rows == 0:
            cols = {self.id_col: batch[self.id_col]}
            for i in range(1, k + 1):
                cols[f"c{i}"] = pa.array([], type=pa.int64())
                cols[f"f{i}"] = pa.array([], type=pa.float64())
            return pa.table(cols)
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n = len(w)
        npx = int(w[0]) * int(h[0])
        rgb = pix.reshape(n, npx, 3)
        q = (((rgb[:, :, 0].astype(np.uint16) >> 4) << 8)
             | ((rgb[:, :, 1].astype(np.uint16) >> 4) << 4)
             | (rgb[:, :, 2].astype(np.uint16) >> 4))    # (n, npx) 12-bit
        q.sort(axis=1)                 # in-place: runs per image
        flat = q.ravel()
        total = n * npx
        change = np.empty(total, dtype=bool)
        change[0] = True
        np.not_equal(flat[1:], flat[:-1], out=change[1:])
        change[::npx] = True           # every row starts a run
        starts = np.flatnonzero(change)
        run_cnt = np.diff(starts, append=np.int64(total))
        run_code = flat[starts].astype(np.int64)
        run_row = starts // npx
        # k segmented-argmax passes over an int32 composite key that is
        # unique per run within a row (codes are distinct after the
        # sort): count desc in the high bits, inverted code in the low
        # 12 so count ties prefer the smaller code. Chosen runs drop to
        # -1 (every live key >= 1<<12 > 0, so "key >= 0" masks them and
        # exhausted rows out of later passes).
        kdt = np.int32 if npx < (1 << 18) else np.int64  # cnt<<12 must fit
        key = (run_cnt.astype(kdt) << kdt(12)) \
            | (kdt(4095) - run_code.astype(kdt))
        row_starts = np.searchsorted(run_row, np.arange(n, dtype=np.int64))
        codes = np.zeros((n, k), dtype=np.int64)
        cnts = np.zeros((n, k), dtype=np.int64)
        for i in range(k):
            rowmax = np.maximum.reduceat(key, row_starts)
            win = np.flatnonzero((key == rowmax[run_row]) & (key >= 0))
            if len(win) == 0:
                break
            wrow = run_row[win]
            codes[wrow, i] = run_code[win]
            cnts[wrow, i] = run_cnt[win]
            key[win] = -1
        # rows with < k distinct colors: pad with the smallest codes NOT
        # in the palette (what ranking all 4096 bins produced). Rare by
        # construction, so the per-row loop is off the hot path.
        for r in np.flatnonzero(cnts[:, k - 1] == 0):
            d = int(np.count_nonzero(cnts[r]))
            present = set(codes[r, :d].tolist())
            pads = [c for c in range(2 * k) if c not in present][:k - d]
            codes[r, d:d + len(pads)] = pads
        cols = {self.id_col: batch[self.id_col]}
        for i in range(k):
            cols[f"c{i+1}"] = pa.array(codes[:, i].astype(np.int64))
            cols[f"f{i+1}"] = pa.array(cnts[:, i] / npx,
                                       type=pa.float64())
        return pa.table(cols)


class SsimVerify:
    """Global SSIM between the decoded pixels and the deterministic
    source pixels — the perceptual companion of DecodeVerify's PSNR
    (Wang et al. 2004, single-window global-statistics form: mean /
    variance / covariance over the whole pixel vector with the standard
    C1=(0.01*255)^2, C2=(0.03*255)^2 stabilizers; population variance).
    A real skimage.metrics.structural_similarity would slot in at this
    seam exactly like the PIL codec seam (functions/pilcodec.py).

    Fully vectorized across the batch: one (n, w*h*3) float64 moment
    pass, no per-image Python. Rows-only operator (pixel payloads never
    reach SQL); the pytest pins a per-image scalar reference."""

    C1 = (0.01 * 255.0) ** 2
    C2 = (0.03 * 255.0) ** 2

    def __init__(self, min_ssim: float = 0.9, bytes_col: str = "bytes",
                 id_col: str = "image_id"):
        self.codec = _load_codec()
        self.min_ssim = min_ssim
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        idx = pc.cast(pc.utf8_slice_codeunits(
            batch[self.id_col].cast(pa.string()), 3, 32), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if not len(idx):
            return batch.append_column(
                "ssim", pa.array([], type=pa.float64())) \
                .append_column("ssim_ok", pa.array([], type=pa.bool_()))
        src = self.codec.gen_pixels(idx, int(w[0]), int(h[0]))
        x = src.astype(np.float64)
        y = pix.astype(np.float64)
        mx = x.mean(axis=1)
        my = y.mean(axis=1)
        vx = x.var(axis=1)
        vy = y.var(axis=1)
        cov = ((x - mx[:, None]) * (y - my[:, None])).mean(axis=1)
        ssim = ((2 * mx * my + self.C1) * (2 * cov + self.C2)) \
            / ((mx * mx + my * my + self.C1) * (vx + vy + self.C2))
        return batch.append_column("ssim", pa.array(ssim)) \
                    .append_column("ssim_ok",
                                   pa.array(ssim >= self.min_ssim))


class SobelEdges:
    """Per-image edge-density signals over decoded pixels — the
    structure/texture curation twin of Sharpness (a near-constant or
    heavily smoothed image scores near 0; busy texture scores high):

    - `edge_mean`: mean L1 Sobel gradient magnitude (|Gx| + |Gy|) of
      the summed-channel luminance over interior pixels (the classic
      3x3 Sobel operator).
    - `edge_max`: the maximum L1 magnitude (int64) — a single strong
      edge detector even in mostly-flat frames.

    Fully vectorized: Gx / Gy are eight shifted adds on the (n, H, W)
    int32 luminance grid, no per-image Python. Stateless-safe (codec
    module import is the only state)."""

    def __init__(self, bytes_col: str = "bytes",
                 id_col: str = "image_id"):
        self.codec = _load_codec()
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({self.id_col: batch[self.id_col],
                             "edge_mean": pa.array([], type=pa.float64()),
                             "edge_max": pa.array([], type=pa.int64())})
        pix, w, h = self.codec.decode_batch(batch[self.bytes_col])
        n = len(w)
        W, H = int(w[0]), int(h[0])
        lum = pix.reshape(n, H, W, 3).astype(np.int32).sum(axis=3)
        # Sobel Gx = [[-1,0,1],[-2,0,2],[-1,0,1]], Gy = Gx.T
        tl = lum[:, :-2, :-2]
        tc = lum[:, :-2, 1:-1]
        tr = lum[:, :-2, 2:]
        ml = lum[:, 1:-1, :-2]
        mr = lum[:, 1:-1, 2:]
        bl = lum[:, 2:, :-2]
        bc = lum[:, 2:, 1:-1]
        br = lum[:, 2:, 2:]
        gx = (tr + 2 * mr + br) - (tl + 2 * ml + bl)
        gy = (bl + 2 * bc + br) - (tl + 2 * tc + tr)
        mag = (np.abs(gx) + np.abs(gy)).reshape(n, -1)
        return pa.table({
            self.id_col: batch[self.id_col],
            "edge_mean": pa.array(mag.mean(axis=1).astype(np.float64)),
            "edge_max": pa.array(mag.max(axis=1).astype(np.int64))})
