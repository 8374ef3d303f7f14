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

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g[[id_col, "sz"]]
        w = g.sort_values(id_col, kind="stable").head(1)
        return w[[id_col, "sz"]]

    return printed.groupby("fp").map_groups(first_wins,
                                            batch_format="pandas")


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

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        cols = [id_col, "chunk_id", "n_chars"]
        if g.empty:
            return g[cols] if set(cols) <= set(g.columns) else \
                pd.DataFrame({c: [] for c in cols})
        return g.sort_values([id_col, "chunk_id"], kind="stable") \
            .head(1)[cols]

    surv = printed.groupby("fp").map_groups(first_wins,
                                            batch_format="pandas")
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
