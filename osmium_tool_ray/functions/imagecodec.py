"""Deterministic fake image codec (the real image libs are not in this
container — per the build brief the decode step is a clearly-marked
deterministic fake, while the Ray-side plumbing (binary columns, schemas,
actor-pool batch stages, PSNR invariants) is real and tested).

Formats:
  "png"  -> b"FPNG" header + w,h uint16 LE + raw RGB bytes (lossless).
  "jpeg" -> b"FJPG" header + w,h uint16 LE + RGB quantized to a step of 4
            (lossy; PSNR vs the source ~42.9 dB, above the >=40 dB gate in
            BASELINE.json input_hint).

Pixels for synthetic row `idx` are a pure function of (seed, idx) via
splitmix64 — byte-stable across runs, processes and retries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import splitmix64

MAGIC = {"png": b"FPNG", "jpeg": b"FJPG"}
_MAGIC_REV = {v: k for k, v in MAGIC.items()}
HEADER_LEN = 8  # magic(4) + w(2) + h(2)


def gen_pixels(idx: np.ndarray, w: int = 16, h: int = 16, seed: int = 42) -> np.ndarray:
    """(n, w*h*3) uint8 pixel matrix, deterministic per (seed, idx)."""
    idx = np.asarray(idx, dtype=np.uint64)
    nbytes = w * h * 3
    nwords = (nbytes + 7) // 8
    base = idx[:, None] * np.uint64(nwords) + np.arange(nwords, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        words = splitmix64(base ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    return words.view(np.uint8)[:, :nbytes].copy()


def _quantize(pix: np.ndarray) -> np.ndarray:
    return (pix & 0xFC) | 0x02  # step-4 quantization, mid-rise reconstruction


def encode_batch(pix: np.ndarray, fmts: np.ndarray, w: int = 16, h: int = 16) -> pa.Array:
    """(n, w*h*3) uint8 + per-row fmt strings -> Arrow binary array, built as
    one contiguous buffer (no per-row Python bytes objects)."""
    n, nbytes = pix.shape
    rec_len = HEADER_LEN + nbytes
    out = np.empty((n, rec_len), dtype=np.uint8)
    fmts = np.asarray(fmts)
    is_jpeg = fmts == "jpeg"
    for fmt, mask in (("png", ~is_jpeg), ("jpeg", is_jpeg)):
        if mask.any():
            out[mask, :4] = np.frombuffer(MAGIC[fmt], dtype=np.uint8)
    hdr = np.empty(4, dtype=np.uint8)
    hdr[0:2] = np.frombuffer(np.uint16(w).tobytes(), dtype=np.uint8)
    hdr[2:4] = np.frombuffer(np.uint16(h).tobytes(), dtype=np.uint8)
    out[:, 4:8] = hdr
    out[:, 8:] = pix
    if is_jpeg.any():
        out[is_jpeg, 8:] = _quantize(pix[is_jpeg])
    offsets = np.arange(0, (n + 1) * rec_len, rec_len, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())])


def decode_batch(bin_arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arrow binary array of equal-size records -> (pixels (n, bytes), w, h).
    Raises on unknown magic (stand-in for a real codec error)."""
    if isinstance(bin_arr, pa.ChunkedArray):
        bin_arr = bin_arr.combine_chunks()
    arr = bin_arr.cast(pa.large_binary())
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset:arr.offset + len(arr) + 1]
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), np.uint8), np.empty(0, np.int32), np.empty(0, np.int32)
    lens = np.diff(offs)
    if not (lens == lens[0]).all():
        raise ValueError("decode_batch expects equal-size records per batch")
    rec = buf[offs[0]:offs[-1]].reshape(n, lens[0])
    magic = rec[:, :4]
    known = np.zeros(n, dtype=bool)
    for m in _MAGIC_REV:
        known |= (magic == np.frombuffer(m, dtype=np.uint8)).all(axis=1)
    if not known.all():
        raise ValueError("unknown image magic in decode_batch")
    w = rec[:, 4:6].copy().view(np.uint16).astype(np.int32).ravel()
    h = rec[:, 6:8].copy().view(np.uint16).astype(np.int32).ravel()
    return rec[:, 8:], w, h


def psnr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row PSNR in dB between two (n, k) uint8 pixel matrices; inf for
    identical rows. Squared error accumulates in int64 via einsum — no
    float64 temporaries the size of the pixel matrix."""
    d = a.astype(np.int16)
    d -= b
    sq = np.einsum("ij,ij->i", d, d, dtype=np.int64)
    mse = sq / a.shape[1]
    with np.errstate(divide="ignore"):
        return 10.0 * np.log10(255.0 * 255.0 / mse)
