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
    """Seam for a real codec. Tries PIL first (absent in this container),
    falls back to the deterministic fake codec."""
    try:  # pragma: no cover - PIL not installed here
        import PIL  # noqa: F401
        raise NotImplementedError(
            "real-PIL decode path not implemented in this sandbox")
    except ImportError:
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
                     h: int = 8) -> pa.Array:
    """Deterministic fake video container: `n_frames` equal-size encoded
    frames (fake-png records) back-to-back per video. Frame f of video i
    holds gen_pixels(i * 1000 + f) — byte-stable, so frame-sampling
    pipelines can verify content."""
    from ..functions import imagecodec

    idx = np.asarray(idx, dtype=np.int64)
    frames = []
    for f in range(n_frames):
        pix = imagecodec.gen_pixels(idx * 1000 + f, w, h)
        frames.append(imagecodec.encode_batch(
            pix, np.full(len(idx), "png"), w, h))
    recs = [b"".join(frames[f][i].as_py() for f in range(n_frames))
            for i in range(len(idx))]
    return pa.array(recs, type=pa.large_binary())


class FrameSample:
    """Actor stage: sample every `stride`-th frame from a video byte stream
    (equal-size encoded frame records back-to-back, the fake container
    above) — one OUTPUT ROW PER SAMPLED FRAME, the video->frames explode
    of a real training pipeline. A real deployment swaps the record
    slicing for an ffmpeg keyframe decode inside the same actor method;
    the Ray-side shape (binary in, exploded rows out, small batch_size)
    is the real thing. Frame bytes are sliced, not re-encoded — memcpy
    only."""

    def __init__(self, stride: int = 2, bytes_col: str = "video",
                 id_col: str = "video_id"):
        from ..functions import imagecodec
        self.codec = imagecodec
        self.stride = stride
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.imagecodec import HEADER_LEN

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
