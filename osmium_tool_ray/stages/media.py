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
