"""Fuzzy benchmark decontamination (stages/dedup.fuzzy_contamination)
vs brute force and the DuckDB QUALIFY oracle."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.dedup import fuzzy_contamination, \
    _word_ngram_sets


def _corpus(seed=111, n=80, vocab=30):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = [" ".join(rng.choice(words, rng.integers(8, 25)))
             for _ in range(n)]
    # plant leaks: docs 70.. copy bench docs with one substitution
    for i in range(5):
        toks = texts[i].split()
        toks[2] = "edit"
        texts[70 + i] = " ".join(toks)
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def _brute(tbl, bench_ids, t, n=3):
    texts = tbl["text"].to_pylist()
    ids = tbl["doc_id"].to_pylist()
    sets = _word_ngram_sets(texts, n)
    bid = [i for i in ids if i in bench_ids]
    out = {}
    for i, d in enumerate(ids):
        best = None
        for b in bid:
            j = ids.index(b)
            inter = np.intersect1d(sets[i], sets[j],
                                   assume_unique=True).size
            union = sets[i].size + sets[j].size - inter
            jc = inter / union if union else 1.0
            if jc >= t and (best is None or jc > best[3]
                            or (jc == best[3] and b < best[0])):
                best = (b, inter, union, jc)
        if best:
            out[d] = best
    return out


def test_fuzzy_contamination_vs_bruteforce(ray_session):
    import ray.data as rd

    tbl = _corpus()
    bench_ids = set(range(5))
    bench = pa.table({"doc_id": pa.array(sorted(bench_ids),
                                         type=pa.int64()),
                      "text": pa.array([tbl["text"][i].as_py()
                                        for i in sorted(bench_ids)])})
    t = 0.4
    out = fuzzy_contamination(rd.from_arrow(tbl).repartition(5),
                              rd.from_arrow(bench), threshold=t)
    mine = {r["doc_id"]: (r["bench_id"], r["inter_sz"], r["union_sz"],
                          r["jacc"]) for r in out.take_all()}
    expect = _brute(tbl, bench_ids, t)
    assert mine == expect
    # planted edits and the bench docs themselves are flagged
    for i in range(5):
        assert i in mine and mine[i][3] == 1.0
        assert (70 + i) in mine


def test_fuzzy_contamination_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _corpus(seed=112)
    bench_tbl = duckdb.sql(
        "SELECT * FROM tbl WHERE doc_id % 17 = 0").arrow()
    t = 0.35
    out = fuzzy_contamination(rd.from_arrow(tbl),
                              rd.from_arrow(bench_tbl), threshold=t)
    mine = {r["doc_id"]: (r["bench_id"], r["inter_sz"], r["union_sz"],
                          r["jacc"]) for r in out.take_all()}
    oracle = duckdb.sql(f"""
        WITH tok AS (SELECT doc_id AS id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                           x -> x <> '') AS ts, lower(text) AS lt
             FROM tbl),
        grams AS (
            SELECT DISTINCT id,
                   list_aggregate(ts[i : i + 2], 'string_agg', ' ') AS sh
            FROM tok, unnest(range(1, len(ts) - 1)) AS u(i)
            WHERE len(ts) >= 3
            UNION
            SELECT DISTINCT id, lt AS sh FROM tok WHERE len(ts) < 3),
        sz AS (SELECT id, COUNT(*) ns FROM grams GROUP BY id),
        inter AS (SELECT d.id AS did, b.id AS bid, COUNT(*) i
            FROM grams d JOIN grams b ON d.sh = b.sh AND b.id % 17 = 0
            GROUP BY 1, 2)
        SELECT did, bid, i, sd.ns + sb.ns - i AS u,
               CAST(i AS DOUBLE) / (sd.ns + sb.ns - i) AS j
        FROM inter JOIN sz sd ON sd.id = did JOIN sz sb ON sb.id = bid
        WHERE CAST(i AS DOUBLE) / (sd.ns + sb.ns - i) >= {t}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY did
                                   ORDER BY j DESC, bid ASC) = 1""") \
        .fetchall()
    assert mine == {d: (b, i, u, j) for d, b, i, u, j in oracle}
