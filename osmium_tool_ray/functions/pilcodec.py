"""Real-image codec behind the media seam — PIL when installed, sniffing
fake-codec records through to functions/imagecodec.

This container ships no image libraries, so stages/media gates on
HAVE_PIL (the sources/readers.HAVE_LANCE pattern): with PIL absent the
deterministic fake codec serves every path; with PIL present real
PNG/JPEG bytes decode through PIL while synthetic FPNG/FJPG records
(the test corpus) still route to the fake codec by magic-byte sniff, so
one DecodeVerify actor can read a mixed lake.

Interface contract (same as imagecodec): decode_batch -> (pixels
(n, w*h*3) uint8, w, h), encode_batch(pix, fmts, w, h) -> Arrow binary,
psnr(src, pix) -> dB. Real codecs are per-image C calls, so the PIL loop
is per-record by necessity — it runs inside the actor-pool stage where
the batch is already small (media.py batch-size guidance).
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa

from . import imagecodec
from .imagecodec import gen_pixels, psnr  # noqa: F401  (shared interface)


def _have_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


HAVE_PIL = _have_pil()

_FAKE_MAGICS = tuple(imagecodec.MAGIC.values())  # b"FPNG", b"FJPG"


def _records(bin_arr) -> list[bytes]:
    if isinstance(bin_arr, pa.ChunkedArray):
        bin_arr = bin_arr.combine_chunks()
    return bin_arr.cast(pa.large_binary()).to_pylist()


def decode_batch(bin_arr):
    """Sniff the batch's container: fake-codec magic delegates to
    imagecodec (vectorized, no PIL needed); anything else decodes through
    PIL. Mixed fake/real batches raise — upstream readers keep formats
    per-partition."""
    if isinstance(bin_arr, pa.ChunkedArray):
        bin_arr = bin_arr.combine_chunks()
    if len(bin_arr) == 0:
        return imagecodec.decode_batch(bin_arr)
    recs = _records(bin_arr)
    fake = [r[:4] in _FAKE_MAGICS for r in recs]
    if all(fake):
        return imagecodec.decode_batch(bin_arr)
    if any(fake):
        raise ValueError("mixed fake/real image records in one batch")
    if not HAVE_PIL:
        raise ImportError("PIL is required to decode real image bytes")
    import PIL.Image

    pix_rows, ws, hs = [], [], []
    for r in recs:
        with PIL.Image.open(io.BytesIO(r)) as im:
            rgb = im.convert("RGB")
            ws.append(rgb.width)
            hs.append(rgb.height)
            pix_rows.append(np.asarray(rgb, dtype=np.uint8).reshape(-1))
    if len(set(ws)) > 1 or len(set(hs)) > 1:
        raise ValueError("decode_batch expects equal-size records per batch")
    return (np.stack(pix_rows),
            np.asarray(ws, dtype=np.int32), np.asarray(hs, dtype=np.int32))


def encode_batch(pix: np.ndarray, fmts, w: int = 16, h: int = 16) -> pa.Array:
    """(n, w*h*3) uint8 -> real PNG (lossless) / JPEG quality-95 bytes."""
    if not HAVE_PIL:
        raise ImportError("PIL is required to encode real image bytes")
    import PIL.Image

    fmts = np.asarray(fmts)
    out = []
    for row, fmt in zip(pix, fmts):
        im = PIL.Image.fromarray(row.reshape(h, w, 3), mode="RGB")
        buf = io.BytesIO()
        if fmt == "jpeg":
            im.save(buf, format="JPEG", quality=95, subsampling=0)
        else:
            im.save(buf, format="PNG")
        out.append(buf.getvalue())
    return pa.array(out, type=pa.large_binary())
