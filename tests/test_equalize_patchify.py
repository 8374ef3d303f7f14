"""Equalize (histogram equalization) and Patchify (ViT patch explosion)
vs per-image numpy references, plus reconstruction invariants."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.functions.imagecodec import (decode_batch,
                                                  encode_batch,
                                                  gen_pixels)
from osmium_tool_ray.stages.media import Equalize, Patchify


def _images(n=24, ids=None):
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    pix = gen_pixels(ids)
    fmt = np.where(ids % 2 == 0, "png", "jpeg")
    return pa.table({
        "image_id": pa.array([f"img{int(i):010d}" for i in ids]),
        "bytes": encode_batch(pix, fmt),
        "fmt": pa.array(fmt.tolist()),
        "w": pa.array(np.full(n, 16, dtype=np.int32)),
        "h": pa.array(np.full(n, 16, dtype=np.int32)),
    }), pix


def _eq_ref(chan, npx):
    hist = np.bincount(chan, minlength=256)
    cdf = np.cumsum(hist)
    return ((cdf * 255) // npx)[chan].astype(np.uint8)


def test_equalize_matches_reference():
    tbl, _ = _images()
    out = rd.from_arrow(tbl).map_batches(
        Equalize, batch_format="pyarrow", concurrency=1).to_pandas()
    out = out.sort_values("image_id").reset_index(drop=True)
    dec, _, _ = decode_batch(pa.array(out["bytes"].tolist(),
                                      type=pa.binary()))
    # reference path: same decoded input the stage saw, equalize in
    # numpy, then the same encode round-trip (so lossy quantization is
    # applied identically) -> byte-exact expectation for BOTH formats
    src, _, _ = decode_batch(pa.array(tbl["bytes"].to_pylist(),
                                      type=pa.binary()))
    npx = 16 * 16
    fmts = np.asarray(tbl["fmt"].to_pylist())
    exp_all = []
    for i in range(len(out)):
        img = src[i].reshape(npx, 3)
        exp_all.append(np.stack([_eq_ref(img[:, c], npx)
                                 for c in range(3)], axis=1).reshape(-1))
    exp_rt, _, _ = decode_batch(
        encode_batch(np.stack(exp_all), fmts))
    for i in range(len(out)):
        assert np.array_equal(dec[i], exp_rt[i]), f"row {i}"
        assert int(out["spread_after"][i]) >= int(out["spread_before"][i]) - 8


def test_patchify_reconstructs_images():
    tbl, pix = _images(n=10)
    out = rd.from_arrow(tbl).map_batches(
        Patchify, fn_constructor_kwargs={"patch": 8},
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert len(out) == 10 * 4                       # 16/8 = 2x2 patches
    dec, _, _ = decode_batch(pa.array(tbl["bytes"].to_pylist(),
                                      type=pa.binary()))
    for i, img_id in enumerate(tbl["image_id"].to_pylist()):
        rows = out[out.image_id == img_id].sort_values("patch_id")
        assert rows.px.tolist() == [0, 1, 0, 1]
        assert rows.py.tolist() == [0, 0, 1, 1]
        img = dec[i].reshape(16, 16, 3)
        recon = np.zeros_like(img)
        for r in rows.itertuples():
            p = np.frombuffer(r.patch, dtype=np.uint8).reshape(8, 8, 3)
            recon[r.py * 8:(r.py + 1) * 8, r.px * 8:(r.px + 1) * 8] = p
        assert np.array_equal(recon, img)
