"""Generic set-Jaccard join (stages/dedup.set_jaccard_join) over flat
(key, token) rows vs brute force and DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa

from osmium_tool_ray.stages.dedup import set_jaccard_join


def _rows(seed=77, keys=30, universe=60, per_key=(5, 25)):
    rng = np.random.default_rng(seed)
    ks, toks = [], []
    for k in range(keys):
        n = rng.integers(*per_key)
        ks += [k] * n
        toks += list(rng.integers(0, universe, n))
    # planted similar pair: key 100/101 share most tokens
    base = list(rng.integers(0, universe, 12))
    ks += [100] * 12 + [101] * 13
    toks += base + base + [universe + 5]
    return pa.table({"k": pa.array(ks, type=pa.int64()),
                     "tok": pa.array(toks, type=pa.int64())})


def _brute(tbl, t):
    import collections
    sets = collections.defaultdict(set)
    for k, v in zip(tbl["k"].to_pylist(), tbl["tok"].to_pylist()):
        sets[k].add(v)
    keys = sorted(sets)
    out = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                out[(a, b)] = (inter, union)
    return out


def test_set_jaccard_vs_bruteforce(ray_session):
    import ray.data as rd

    tbl = _rows()
    t = 0.5
    out = set_jaccard_join(rd.from_arrow(tbl).repartition(5), "k", "tok",
                           threshold=t, coarse=4)
    mine = {(r["a"], r["b"]): (r["inter_sz"], r["union_sz"])
            for r in out.take_all()}
    expect = _brute(tbl, t)
    assert mine == expect
    assert (100, 101) in expect


def test_set_jaccard_vs_duckdb(ray_session):
    import ray.data as rd

    tbl = _rows(seed=78)
    t = 0.4
    out = set_jaccard_join(rd.from_arrow(tbl), "k", "tok", threshold=t,
                           coarse=3)
    mine = {(r["a"], r["b"]): (r["inter_sz"], r["union_sz"], r["jacc"])
            for r in out.take_all()}
    oracle = duckdb.sql(f"""
        WITH dc AS (SELECT DISTINCT k, tok FROM tbl),
        sz AS (SELECT k, COUNT(*) s FROM dc GROUP BY k),
        inter AS (SELECT a.k ia, b.k ib, COUNT(*) i
          FROM dc a JOIN dc b ON a.tok = b.tok AND a.k < b.k GROUP BY 1,2)
        SELECT ia, ib, i, sa.s + sb.s - i,
               CAST(i AS DOUBLE) / (sa.s + sb.s - i)
        FROM inter JOIN sz sa ON sa.k = ia JOIN sz sb ON sb.k = ib
        WHERE CAST(i AS DOUBLE) / (sa.s + sb.s - i) >= {t}""").fetchall()
    assert mine == {(a, b): (i, u, j) for a, b, i, u, j in oracle}


def test_set_jaccard_bitmask_matches_generic(ray_session):
    """Universe <= 64 triggers the bitmask all-pairs path; forcing the
    generic prefix path (small_universe_cap=0) must give identical
    results."""
    import ray.data as rd

    from osmium_tool_ray.stages.dedup import jaccard_join, key_token_sets, \
        _unpack_u64_sets

    tbl = _rows(seed=79, keys=25, universe=40)
    sets_ds = key_token_sets(rd.from_arrow(tbl), "k", "tok").materialize()
    t = 0.45
    kw = dict(text_col="_packed", id_col="k", threshold=t,
              coarse=3, sets_fn=_unpack_u64_sets)
    bm = jaccard_join(sets_ds, **kw)
    gen = jaccard_join(sets_ds, small_universe_cap=0, **kw)
    key = lambda rows: sorted((r["a"], r["b"], r["inter_sz"],
                               r["union_sz"]) for r in rows)
    assert key(bm.take_all()) == key(gen.take_all()) == \
        sorted((a, b, i, u) for (a, b), (i, u) in _brute(tbl, t).items())
