"""Sharpness stage (stages/media.py): variance-of-Laplacian blur score
and letterbox border runs vs a per-image pure-Python reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.functions.imagecodec import encode_batch
from osmium_tool_ray.stages.media import Sharpness

H = W = 16


def _table(pixels):
    n = len(pixels)
    fmt = np.asarray(["png"] * n)
    return pa.table({
        "image_id": pa.array([f"img{i:010d}" for i in range(n)]),
        "bytes": encode_batch(np.asarray(pixels, dtype=np.uint8)
                              .reshape(n, -1), fmt),
        "fmt": pa.array(fmt.tolist()),
        "w": pa.array(np.full(n, W, dtype=np.int32)),
        "h": pa.array(np.full(n, H, dtype=np.int32)),
    })


def _ref_one(img):
    lum = img.astype(np.int64).sum(axis=2)
    laps = []
    for i in range(1, H - 1):
        for j in range(1, W - 1):
            laps.append(4 * lum[i, j] - lum[i - 1, j] - lum[i + 1, j]
                        - lum[i, j - 1] - lum[i, j + 1])
    laps = np.asarray(laps, dtype=np.float64)
    sharp = laps.var()

    def run(seq, ref):
        k = 0
        for v in seq:
            if not np.array_equal(v, ref):
                break
            k += 1
        return k

    tl, br = img[0, 0], img[-1, -1]
    top = run([img[i] for i in range(H)],
              np.broadcast_to(tl, (W, 3)))
    bot = run([img[i] for i in range(H - 1, -1, -1)],
              np.broadcast_to(br, (W, 3)))
    left = run([img[:, j] for j in range(W)],
               np.broadcast_to(tl, (H, 3)))
    right = run([img[:, j] for j in range(W - 1, -1, -1)],
                np.broadcast_to(br, (H, 3)))
    boxed = bool(((top + bot > 0) and top < H and bot < H)
                 or ((left + right > 0) and left < W and right < W))
    return sharp, top, bot, left, right, boxed


def test_sharpness_matches_reference(ray_session):
    rng = np.random.default_rng(5)
    imgs = []
    imgs.append(np.full((H, W, 3), 80, dtype=np.uint8))      # constant
    imgs.append(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))  # noise
    smooth = np.repeat(np.repeat(
        rng.integers(0, 256, (4, 4, 3), dtype=np.uint8), 4, 0), 4, 1)
    imgs.append(smooth)                                      # blocky
    box = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)    # letterbox
    box[:3] = 0
    box[-2:] = 0
    box[0, 0] = 0
    imgs.append(box)
    pillar = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    pillar[:, :4] = 255
    pillar[:, -1:] = 255
    imgs.append(pillar)

    out = rd.from_arrow(_table(imgs)).map_batches(
        Sharpness, batch_format="pyarrow", concurrency=1).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    for i, img in enumerate(imgs):
        sharp, top, bot, left, right, boxed = _ref_one(img)
        row = out.iloc[i]
        assert row["sharpness"] == sharp, i
        assert (row["border_top"], row["border_bottom"],
                row["border_left"], row["border_right"]) == \
            (top, bot, left, right), i
        assert bool(row["letterboxed"]) == boxed, i
    assert out.iloc[0]["sharpness"] == 0.0          # constant image
    assert out.iloc[1]["sharpness"] > out.iloc[2]["sharpness"]  # noise>blocky
    assert bool(out.iloc[3]["letterboxed"])
    assert bool(out.iloc[4]["letterboxed"])
