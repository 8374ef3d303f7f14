"""vocab_build (word2id table), pack_bins (sequence packing) and
phash_topk (hamming similarity search) vs DuckDB / numpy references."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.windows import pack_bins
from osmium_tool_ray.stages.knn import phash_topk
from osmium_tool_ray.stages.text import vocab_build


def test_vocab_build_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "rare1", "rare2"])
    texts = [" ".join(vocab[rng.integers(0, 6, rng.integers(3, 12))])
             for _ in range(120)]
    tbl = pa.table({"text": pa.array(texts)})
    out = vocab_build(rd.from_arrow(tbl).repartition(7), min_count=2)
    mine = sorted((r["word"], r["n"], r["word_id"]) for r in out.take_all())
    oracle = duckdb.sql(r"""
        WITH words AS (
            SELECT t.w AS word
            FROM tbl, unnest(string_split_regex(lower(text), '\s+')) AS t(w)
            WHERE t.w <> ''),
        counts AS (SELECT word, count(*) AS n FROM words
                   GROUP BY word HAVING count(*) >= 2)
        SELECT word, n,
               row_number() OVER (ORDER BY n DESC, word) - 1 AS word_id
        FROM counts""").fetchall()
    assert mine == sorted(oracle)
    # ids are dense 0..V-1
    ids = sorted(r[2] for r in mine)
    assert ids == list(range(len(ids)))


def test_vocab_build_min_count_prunes(ray_session):
    import ray.data as rd

    tbl = pa.table({"text": pa.array(["a a a b", "a c"])})
    out = {r["word"]: (r["n"], r["word_id"])
           for r in vocab_build(rd.from_arrow(tbl), min_count=2).take_all()}
    assert out == {"a": (4, 0)}


def test_pack_bins_vs_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)
    n = 300
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "sz": pa.array(rng.integers(1, 900, n), type=pa.int64()),
    })
    out = pack_bins(rd.from_arrow(tbl).repartition(9), ["doc_id"], "sz",
                    budget=2048)
    mine = {r["doc_id"]: (r["bin"], r["offset"]) for r in out.take_all()}
    oracle = duckdb.sql("""
        SELECT doc_id,
               COALESCE(SUM(sz) OVER (ORDER BY doc_id ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS b,
               COALESCE(SUM(sz) OVER (ORDER BY doc_id ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 2048 AS o
        FROM tbl""").fetchall()
    assert mine == {d: (b, o) for d, b, o in oracle}
    # bins are contiguous from 0
    bins = {b for b, _ in mine.values()}
    assert bins == set(range(max(bins) + 1))


def test_phash_topk_vs_bruteforce(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(21)
    n = 400
    hashes = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    ids = np.asarray([f"im{i:04d}" for i in range(n)])
    tbl = pa.table({"image_id": pa.array(ids),
                    "phash": pa.array(hashes.view(np.int64))})
    qidx = np.array([3, 77, 250])
    qids = qidx.astype(np.int64)
    qph = hashes[qidx]
    out = phash_topk(rd.from_arrow(tbl).repartition(5), qids, qph, k=4,
                     exclude=ids[qidx])
    mine = {}
    for r in out.take_all():
        mine.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["dist"]))
    popcnt = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                           axis=1).sum(axis=1)
    for qi, q in zip(qidx, qids):
        x = hashes ^ hashes[qi]
        d = popcnt[x.view(np.uint8).reshape(n, 8)].sum(axis=1)
        order = sorted((int(d[j]), ids[j]) for j in range(n) if j != qi)[:4]
        got = sorted(mine[q])
        assert [(dd, nid) for _, nid, dd in got] == \
            [(dd, nid) for dd, nid in order]
        assert [r0 for r0, _, _ in got] == [1, 2, 3, 4]
