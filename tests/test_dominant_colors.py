"""DominantColors (stages/media.py): top-k quantized palette vs a
per-image Counter reference, tie determinism, constant images."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.functions.imagecodec import encode_batch, gen_pixels
from osmium_tool_ray.stages.media import DominantColors

H = W = 16


def _table(pixels):
    n = len(pixels)
    fmt = np.asarray(["png"] * n)
    return pa.table({
        "image_id": pa.array([f"img{i:010d}" for i in range(n)]),
        "bytes": encode_batch(np.asarray(pixels, dtype=np.uint8)
                              .reshape(n, -1), fmt)})


def _ref_one(img, k=4):
    q = [((int(r) >> 4) << 8) | ((int(g) >> 4) << 4) | (int(b) >> 4)
         for r, g, b in img.reshape(-1, 3)]
    cnt = Counter(q)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    top += [(0, 0)] * (k - len(top))
    return top


def test_dominant_colors_reference(ray_session):
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
            for _ in range(6)]
    imgs.append(np.full((H, W, 3), 200, dtype=np.uint8))  # constant
    two = np.zeros((H, W, 3), dtype=np.uint8)             # exact tie
    two[:, :8] = 255
    imgs.append(two)
    # synthetic-codec pixels too (the corpus path)
    imgs.extend(gen_pixels(np.arange(4)).reshape(4, H, W, 3))

    out = rd.from_arrow(_table(imgs)).map_batches(
        DominantColors, batch_format="pyarrow",
        concurrency=1).to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    npx = H * W
    for i, img in enumerate(imgs):
        want = _ref_one(img)
        row = out.iloc[i]
        for j, (code, cnt) in enumerate(want, start=1):
            if cnt == 0:
                continue      # fewer distinct colors than k
            assert row[f"c{j}"] == code, (i, j)
            assert row[f"f{j}"] == cnt / npx, (i, j)
    # constant image: one color covers everything
    assert out.iloc[6]["f1"] == 1.0
    # exact two-color tie ranks smaller code first
    t = out.iloc[7]
    assert t["f1"] == 0.5 and t["f2"] == 0.5 and t["c1"] < t["c2"]
