"""Leakage-safe splitting (pipelines/sampling.leakage_safe_split):
duplicates always share a split; proportions follow the rep % 100
rule; DuckDB window-function parity."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.sampling import leakage_safe_split


def _docs(seed=7, n=400, dup_every=5):
    rng = np.random.default_rng(seed)
    vocab = np.array(["a", "b", "c", "d", "e", "f"])
    texts = [" ".join(vocab[rng.integers(0, 6, rng.integers(3, 12))])
             for _ in range(n)]
    # plant exact duplicates: doc i copies doc i - dup_every's text
    for i in range(dup_every, n, dup_every):
        texts[i] = texts[i - dup_every]
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "text": pa.array(texts)})


def test_split_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _docs()
    out = leakage_safe_split(rd.from_arrow(tbl).repartition(4))
    mine = sorted((r["doc_id"], r["split"], r["rep"])
                  for r in out.take_all())
    oracle = duckdb.sql("""
        WITH rep AS (SELECT doc_id,
                            min(doc_id) OVER (PARTITION BY text) AS rep
                     FROM tbl)
        SELECT doc_id,
               CASE WHEN rep % 100 < 10 THEN 'test'
                    WHEN rep % 100 < 20 THEN 'val'
                    ELSE 'train' END AS split,
               rep
        FROM rep ORDER BY doc_id""").fetchall()
    assert mine == [tuple(r) for r in oracle]


def test_no_duplicate_straddles_splits(ray_session):
    import ray.data as rd

    tbl = _docs()
    out = leakage_safe_split(rd.from_arrow(tbl).repartition(3))
    split_of = {r["doc_id"]: r["split"] for r in out.take_all()}
    texts = tbl["text"].to_pylist()
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, set()).add(split_of[i])
    assert all(len(s) == 1 for s in by_text.values())
    # all three splits are populated under the 10/10/80 rule
    assert set(split_of.values()) == {"train", "val", "test"}


def test_neardup_split_groups_paraphrases(ray_session):
    """Slightly-perturbed copies (high-Jaccard near-dups, not exact)
    must share a split with their source."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.sampling import leakage_safe_split_neardup

    rng = np.random.default_rng(4)
    base = ["the quick brown fox jumps over the lazy dog again and again",
            "pack my box with five dozen liquor jugs every single day",
            "how vexingly quick daft zebras jump over anything at all"]
    texts, source = [], []
    for i in range(120):
        b = i % 3
        t = base[b]
        if i >= 3:          # perturb a single word (near-dup, not exact)
            words = t.split()
            words[int(rng.integers(0, len(words)))] = f"w{i}"
            t = " ".join(words)
        texts.append(t)
        source.append(b)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    out = leakage_safe_split_neardup(
        rd.from_arrow(tbl).repartition(3), threshold=0.5)
    rows = {r["doc_id"]: (r["split"], r["rep"]) for r in out.take_all()}
    assert len(rows) == len(texts)
    # every variant of a base text maps to one rep and one split
    for b in range(3):
        group = {rows[i] for i in range(len(texts)) if source[i] == b}
        assert len(group) == 1, (b, group)
    # reps of the three groups are the three seed docs
    assert {rows[i][1] for i in (0, 1, 2)} == {0, 1, 2}


def test_neardup_split_bucketed_path_identical(ray_session):
    """Forced bucketed rep-attach (broadcast_cap=0) must match the
    broadcast path row for row — the round-4 de-driver of the dup
    table (pipelines/sampling._neardup_split_bucketed)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.sampling import leakage_safe_split_neardup

    rng = np.random.default_rng(7)
    base = ["the quick brown fox jumps over the lazy dog again and again",
            "pack my box with five dozen liquor jugs every single day",
            "how vexingly quick daft zebras jump over anything at all"]
    texts = []
    for i in range(90):
        t = base[i % 3]
        if i >= 3:
            words = t.split()
            words[int(rng.integers(0, len(words)))] = f"w{i}"
            t = " ".join(words)
        texts.append(t)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(3)
    broad = leakage_safe_split_neardup(ds, threshold=0.5,
                                       attach_mode="broadcast")
    buck = leakage_safe_split_neardup(ds, threshold=0.5,
                                      attach_mode="auto",
                                      broadcast_cap=0, buckets=8)
    rb = sorted((r["doc_id"], r["split"], r["rep"])
                for r in broad.take_all())
    rk = sorted((r["doc_id"], r["split"], r["rep"])
                for r in buck.take_all())
    assert rb == rk
    assert len(rb) == len(texts)
