"""End-to-end curation pipeline (pipelines/curation.curate_docs) vs the
DuckDB oracle on a fixture with planted duplicates and short docs."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.curation import curate_docs


def test_curate_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(12)
    vocab = np.array(["alpha", "beta", "Customer", "gamma", "delta"])
    texts = [" ".join(vocab[rng.integers(0, 5, 30)]) for _ in range(70)]
    texts[10] = texts[4]                       # exact dup after cleaning
    texts[11] = texts[4].upper()               # dup only AFTER lowering
    texts[12] = "too short"                    # filtered out
    tbl = pa.table({"doc_id": pa.array(range(70), type=pa.int64()),
                    "text": pa.array(texts)})
    out = curate_docs(rd.from_arrow(tbl).repartition(6),
                      min_chars=64, budget=512)
    mine = {r["doc_id"]: (r["n_chars_clean"], r["bin"], r["offset"])
            for r in out.take_all()}
    oracle = duckdb.sql(r"""
        WITH norm AS (SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text),
                     '\b(?:customer|supplier|part)\b', '<ENT>', 'g'),
                     '  +', ' ', 'g'), ' ') AS clean FROM tbl),
        ok AS (SELECT doc_id, clean, length(clean) AS sz
               FROM norm WHERE length(clean) >= 64),
        surv AS (SELECT MIN(doc_id) AS doc_id, MIN(sz) AS sz
                 FROM ok GROUP BY clean)
        SELECT doc_id, sz, cumprev // 512, cumprev % 512
        FROM (SELECT doc_id, sz,
                     COALESCE(SUM(sz) OVER (ORDER BY doc_id ROWS BETWEEN
                         UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS cumprev
              FROM surv)""").fetchall()
    assert mine == {d: (s, b, o) for d, s, b, o in oracle}
    # dups lost, short doc filtered, winner is the smallest id
    assert 4 in mine and 10 not in mine and 11 not in mine
    assert 12 not in mine


def test_prep_chunks_dedups_shared_boilerplate(ray_session):
    """Chunk-level dedup: two different docs sharing a license-header
    prefix long enough to align on the chunk grid keep only ONE copy of
    the shared chunk; offsets re-pack contiguously."""
    import pyarrow as pa
    import ray.data as rd

    from osmium_tool_ray.pipelines.curation import prep_chunks

    header = "shared license header " * 12          # 264 chars > size
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([header + "alpha body", header + "beta body"])}))
    out = prep_chunks(docs, size=64, stride=64, budget=128).take_all()
    # chunk 0 of doc 2 duplicates chunk 0 of doc 1 -> dropped
    keys = {(r["doc_id"], r["chunk_id"]) for r in out}
    assert (1, 0) in keys and (2, 0) not in keys
    # every kept row has a valid (bin, offset) under contiguous packing
    rows = sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"]))
    cum = 0
    for r in rows:
        assert r["bin"] == cum // 128 and r["offset"] == cum % 128
        cum += r["n_chars"]
