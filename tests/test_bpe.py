"""BPE operators (stages/text.bpe_pair_counts / bpe_train): pair counts
vs a DuckDB oracle, merge sequence vs a pure-Python reference BPE
(Sennrich et al. 2016 greedy left-to-right merge semantics)."""

import collections

import duckdb
import pyarrow as pa

from osmium_tool_ray.stages.text import bpe_pair_counts, bpe_train

TEXTS = [
    "low low low low low lower lower newest newest newest newest newest"
    " newest widest widest widest",
    "new new newer the cat sat on the mat",
    "aaa aa a aaaa",          # overlapping-run merge stress (a,a)
    "",                        # empty doc
    "Mixed CASE tokens",
]


def _docs():
    return pa.table({"doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                     "text": pa.array(TEXTS)})


def _ref_bpe(texts, k):
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w)] += 1
    merges = []
    for step in range(k):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms[:-1], syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, n))
        new = collections.Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += f
        vocab = new
    return merges


def test_bpe_pair_counts_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _docs()
    out = bpe_pair_counts(rd.from_arrow(tbl).repartition(3), min_count=2)
    mine = sorted((r["pair"], r["n"]) for r in out.take_all())
    oracle = duckdb.sql(r"""
        WITH words AS (
            SELECT t.w AS w
            FROM tbl, unnest(string_split_regex(lower(text), '\s+')) AS t(w)
            WHERE length(t.w) > 1),
        pairs AS (
            SELECT substr(w, i, 2) AS pair
            FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
                  FROM words))
        SELECT pair, count(*) AS n
        FROM pairs GROUP BY pair HAVING count(*) >= 2
        ORDER BY pair""").fetchall()
    assert mine == [tuple(r) for r in oracle]


def test_bpe_train_matches_reference(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs()).repartition(3)
    mt = bpe_train(ds, num_merges=10)
    mine = list(zip(mt["step"].to_pylist(), mt["left"].to_pylist(),
                    mt["right"].to_pylist(), mt["n"].to_pylist()))
    assert mine == _ref_bpe(TEXTS, 10)


def _ref_apply(texts, merges):
    """Pure-Python greedy left-to-right merge replay per word."""
    out = []
    for t in texts:
        words = [w for w in t.lower().split() if w]
        total = 0
        for w in words:
            syms = list(w)
            for _, a, b, _n in merges:
                res, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            total += len(syms)
        out.append((len(words), total))
    return out


def test_bpe_apply_matches_reference(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.text import bpe_apply

    ds = rd.from_arrow(_docs()).repartition(3)
    merges_tbl = bpe_train(ds, num_merges=8)
    merges = list(zip(merges_tbl["step"].to_pylist(),
                      merges_tbl["left"].to_pylist(),
                      merges_tbl["right"].to_pylist(),
                      merges_tbl["n"].to_pylist()))
    out = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_apply(ds, merges_tbl).take_all()}
    ref = _ref_apply(TEXTS, merges)
    for i in range(len(TEXTS)):
        assert out[i] == ref[i], (i, out[i], ref[i])
