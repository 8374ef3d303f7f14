"""Per-row invariant validation (BASELINE.json input_hint: "decoded-pixel
allclose (PSNR>=40dB for lossy) + caption equality" preserved through every
stage).

InvariantCheck is a map_batches stage droppable after ANY pipeline stage:
for synthetic-corpus rows it recomputes the expected caption/phash (pure
functions of image_id — sources/corpus derivation) and, when `bytes` is
present, decodes and PSNR-checks the pixels. Violations raise (fail-stop,
like the reference's CheckOrder handler aborting on broken input,
/root/reference/src/main.cpp:136-139) or are flagged in columns with
mode="flag"."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.corpus import PHASH_MOD


class InvariantCheck:
    def __init__(self, mode: str = "raise", min_psnr: float = 40.0,
                 check_pixels: bool = True):
        if mode not in ("raise", "flag"):
            raise ValueError("mode must be 'raise' or 'flag'")
        self.mode = mode
        self.min_psnr = min_psnr
        self.check_pixels = check_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = pc.cast(pc.utf8_slice_codeunits(
            batch["image_id"].cast(pa.string()), 3, 32), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ok = np.ones(batch.num_rows, dtype=bool)
        if "phash" in batch.schema.names:
            expect = (ids * 2654435761) % PHASH_MOD
            ok &= batch["phash"].to_numpy(zero_copy_only=False) == expect
        if "caption" in batch.schema.names:
            # caption must still start with "caption <id> " (suffix is the
            # free-form tagword; byte equality of the prefix is the contract)
            prefix = pa.array([f"caption {i} " for i in ids.tolist()],
                              type=pa.string())
            ok &= pc.starts_with(batch["caption"].cast(pa.string()),
                                 pattern="caption ").to_numpy(zero_copy_only=False)
            got_id = pc.extract_regex(batch["caption"].cast(pa.string()),
                                      pattern=r"^caption (?P<i>[0-9]+) ")
            gi = got_id.combine_chunks().field("i") if isinstance(got_id, pa.ChunkedArray) \
                else got_id.field("i")
            gi = pc.cast(gi, pa.int64()).fill_null(-1).to_numpy(zero_copy_only=False)
            ok &= gi == ids
        if self.check_pixels and "bytes" in batch.schema.names:
            from ..functions.imagecodec import decode_batch, gen_pixels, psnr

            pix, w, h = decode_batch(batch["bytes"])
            src = gen_pixels(ids, int(w[0]) if len(w) else 16,
                             int(h[0]) if len(h) else 16)
            p = np.minimum(psnr(src, pix), 99.0)
            ok &= p >= self.min_psnr
        if self.mode == "raise":
            if not ok.all():
                bad = np.asarray(batch["image_id"].to_pylist())[~ok][:5]
                raise ValueError(f"invariant violation on rows {bad.tolist()}")
            return batch
        return batch.append_column("invariants_ok", pa.array(ok))
