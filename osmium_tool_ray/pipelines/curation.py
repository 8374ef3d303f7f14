"""End-to-end training-data curation — the flagship composition proving
the engine's stages assemble into the full pipeline a data team runs
before tokenization: normalize -> filter -> exact-dedup -> pack.

Every step is one of the engine's existing primitives chained lazily
(streaming end to end, one narrow shuffle for the dedup groupby and one
sort for the packing scan):

  1. stages/text.Normalizer — redaction/cleaning map (zero-copy Arrow);
  2. length filter on the CLEANED text (map-side);
  3. exact dedup: 64-bit fingerprint of the cleaned text, groupby(fp),
     smallest doc_id survives (the dedup_exact_docs shape — fingerprint
     equality stands in for string equality at a ~2^-64 collision risk);
  4. pipelines/windows.pack_bins — contiguous fixed-budget packing of
     the survivors in doc_id order.

Returns (doc_id, n_chars_clean:int64, bin:int64, offset:int64)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def curate_survivors(docs, min_chars: int = 64,
                     text_col: str = "text", id_col: str = "doc_id"):
    """Stages 1-3 of the curation pipeline (normalize -> length filter ->
    exact dedup): returns the surviving (id_col, sz:int64) rows. Split
    out so the resumable job CLI can checkpoint survivors before the
    packing sort."""
    from ..stages.text import Fingerprint, Normalizer

    # normalize + filter + fingerprint FUSED into one stateless task:
    # chaining fixed-size actor pools (concurrency=N) reserves their
    # CPUs for the whole pipeline and can starve the shuffle stages on
    # small sessions (CLAUDE.md pool-reservation landmine) — and the
    # fused form shuffles only (id, sz, fp), never the cleaned text
    normalize = Normalizer(text_col=text_col)
    fingerprint = Fingerprint(text_col="clean")

    def prep(batch: pa.Table) -> pa.Table:
        batch = normalize(batch)
        sz = pc.utf8_length(batch["clean"]).cast(pa.int64())
        batch = batch.append_column("sz", sz)
        kept = batch.filter(pc.greater_equal(sz, min_chars))
        return fingerprint(kept).select([id_col, "sz", "fp"])

    printed = docs.map_batches(prep, batch_format="pyarrow")

    # keep-first by fingerprint (lowest id wins): map-side pre-prune +
    # ONE hash(fp)%buckets bucket fold via dedup_exact — the old
    # groupby(fp).map_groups(pandas head) paid ~5 ms per distinct
    # fingerprint (group_by_key_bucket discipline)
    from .merge import dedup_exact

    return dedup_exact(printed, ["fp"], order_col=id_col) \
        .select_columns([id_col, "sz"])


def pack_survivors(survivors, budget: int = 8192, id_col: str = "doc_id"):
    """Stage 4: fixed-budget sequence packing of the survivor table."""
    from .windows import pack_bins

    packed = pack_bins(survivors, [id_col], "sz", budget)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "n_chars_clean": batch["sz"].cast(pa.int64()),
            "bin": batch["bin"].cast(pa.int64()),
            "offset": batch["offset"].cast(pa.int64()),
        })

    return packed.map_batches(fin, batch_format="pyarrow")


def curate_docs(docs, min_chars: int = 64, budget: int = 8192,
                text_col: str = "text", id_col: str = "doc_id"):
    """The one-shot composition: survivors -> packing (see module
    docstring). The job CLI (jobs/curation_job.py) runs the same two
    halves with a checkpoint between them."""
    return pack_survivors(
        curate_survivors(docs, min_chars, text_col, id_col),
        budget, id_col)


def prep_chunks(docs, size: int = 256, stride: int = 192,
                budget: int = 8192, text_col: str = "text",
                id_col: str = "doc_id"):
    """The chunk-level prep flagship: normalize -> context-window chunk
    -> exact chunk dedup -> fixed-budget packing. This is curate_docs
    one level deeper — dedup and packing operate on CHUNKS (the unit a
    tokenizer consumes), so boilerplate shared across documents (headers,
    license blocks) dedups even when the parent docs differ.

    Same scale discipline as curate_docs: normalize+chunk+fingerprint
    fuse into stateless map tasks, the dedup groupby shuffles only
    (id, chunk_id, n_chars, fp), and the packing scan is one sort.
    Returns (id_col, chunk_id:int64, n_chars:int64, bin:int64,
    offset:int64)."""
    import pandas as pd

    from ..stages.text import Fingerprint, Normalizer, chunk_docs
    from .windows import pack_bins

    normalize = Normalizer(text_col=text_col)
    fingerprint = Fingerprint(text_col="chunk")

    def prep(batch: pa.Table) -> pa.Table:
        return normalize(batch).select([id_col, "clean"])

    chunks = chunk_docs(docs.map_batches(prep, batch_format="pyarrow"),
                        size=size, stride=stride, text_col="clean",
                        id_col=id_col)

    def fp_narrow(batch: pa.Table) -> pa.Table:
        return fingerprint(batch).select([id_col, "chunk_id", "n_chars",
                                          "fp"])

    printed = chunks.map_batches(fp_narrow, batch_format="pyarrow")

    # keep-first by chunk fingerprint (lowest (id, chunk_id) wins):
    # dedup_exact's pre-prune + bucket fold, not per-fp pandas groups
    from .merge import dedup_exact

    surv = dedup_exact(printed, ["fp"],
                       order_col=[id_col, "chunk_id"]) \
        .select_columns([id_col, "chunk_id", "n_chars"])
    packed = pack_bins(surv, [id_col, "chunk_id"], "n_chars", budget)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "chunk_id": batch["chunk_id"].cast(pa.int64()),
            "n_chars": batch["n_chars"].cast(pa.int64()),
            "bin": batch["bin"].cast(pa.int64()),
            "offset": batch["offset"].cast(pa.int64()),
        })

    return packed.map_batches(fin, batch_format="pyarrow")


def curate_images(images, level: int = 8, per_tile_k: int = 10,
                  min_psnr: float = 40.0, buckets: int | None = None,
                  concurrency=None, id_col: str = "image_id"):
    """Image-side curation flagship: decode/PSNR-verify every image
    (stages/media.DecodeVerify actor pool — the input_hint per-row
    invariant), drop failures, assign web-mercator-style grid tiles
    from lon/lat, and keep the top `per_tile_k` images per tile by
    (phash, id) — deterministic spatially-balanced subsampling, the
    image twin of curate_docs (dedup by content key, then budgeted
    selection).

    Scale shape: blobs never shuffle — after the verify stage the
    pipeline projects to narrow (id, phash, cell) rows; per-tile
    selection is an in-batch vectorized partial top-k (at most k rows
    per tile survive EACH batch) followed by ONE hash(cell)%buckets
    shuffle and the same vectorized fold — no per-tile map_groups at
    web-scale tile cardinality, no full sort.

    Returns (image_id, cell_x, cell_y, rk:int64) with rk < per_tile_k
    the final rank within the tile."""
    import numpy as np

    from ..stages.media import DecodeVerify

    if buckets is None:
        import ray
        buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 8)))
    n = np.int64(1) << np.int64(level)

    def _topk_rows(ids, phash, cx, cy):
        """Vectorized per-tile rank by (phash, id); returns selection
        mask and ranks for rows with rank < per_tile_k."""
        key = (cx << np.int64(32)) | cy
        order = np.lexsort((ids, phash, key))
        ks = key[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(ks)), 0))
        rk = np.arange(len(ks)) - run_start
        sel = rk < per_tile_k
        return order[sel], rk[sel].astype(np.int64)

    def project(batch: pa.Table) -> pa.Table:
        keep = batch["pix_ok"].to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(keep))
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        cy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
        np.clip(cx, 0, n - 1, out=cx)
        np.clip(cy, 0, n - 1, out=cy)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(str)
        phash = batch["phash"].to_numpy(zero_copy_only=False)
        idx, _ = _topk_rows(ids, phash, cx, cy)
        b = ((cx[idx] * np.int64(0x9E3779B1) + cy[idx])
             % np.int64(buckets)).astype(np.int32)
        return pa.table({
            id_col: batch[id_col].take(pa.array(idx)),
            "phash": batch["phash"].take(pa.array(idx)),
            "cell_x": pa.array(cx[idx]),
            "cell_y": pa.array(cy[idx]),
            "_b": pa.array(b),
        })

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.string()),
                          "cell_x": pa.array([], type=pa.int64()),
                          "cell_y": pa.array([], type=pa.int64()),
                          "rk": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "cell_x" not in g.schema.names:
            return empty
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(str)
        phash = g["phash"].to_numpy(zero_copy_only=False)
        cx = g["cell_x"].to_numpy(zero_copy_only=False)
        cy = g["cell_y"].to_numpy(zero_copy_only=False)
        idx, rk = _topk_rows(ids, phash, cx, cy)
        return pa.table({id_col: g[id_col].take(pa.array(idx)),
                         "cell_x": pa.array(cx[idx]),
                         "cell_y": pa.array(cy[idx]),
                         "rk": pa.array(rk)})

    if concurrency is None:
        # stateless fused tasks (DecodeVerify's only state is the codec
        # module import): no pool-reservation, verify fuses with the read
        def _verify(batch: pa.Table) -> pa.Table:
            return DecodeVerify(min_psnr=min_psnr, id_col=id_col)(batch)

        verified = images.map_batches(_verify, batch_format="pyarrow")
    else:
        verified = images.map_batches(
            DecodeVerify, fn_constructor_kwargs={"min_psnr": min_psnr,
                                                 "id_col": id_col},
            batch_format="pyarrow", concurrency=concurrency)
    return verified.map_batches(project, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pyarrow")
