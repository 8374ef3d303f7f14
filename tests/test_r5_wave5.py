"""Round-5 wave 5: containment join (asymmetric), basket brand pairs,
order-size distribution, repeat-purchase intervals."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _shingles(text, n=3):
    ws = [w for w in __import__("re").split(r"[^a-z0-9_]+", text.lower())
          if w]
    if len(ws) < n:
        return {text.lower()}
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def test_containment_catches_what_jaccard_misses(ray_session):
    import ray.data as rd

    from osmium_tool_ray.stages.dedup import containment_join, jaccard_join

    quote = "the quick brown fox jumps over the lazy dog again today"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
    docs = rd.from_items([
        {"doc_id": 1, "text": quote},
        {"doc_id": 2, "text": quote + " " + filler},   # superset of 1
        {"doc_id": 3, "text": "completely different content here now"},
    ]).repartition(2)
    out = containment_join(docs, threshold=0.9, n=3).take_all()
    got = {(r["a"], r["b"]) for r in out}
    assert (1, 2) in got                      # 1 fully contained in 2
    assert (2, 1) not in got                  # not symmetric
    for r in out:
        if (r["a"], r["b"]) == (1, 2):
            sa = _shingles(quote)
            sb = _shingles(quote + " " + filler)
            assert r["a_sz"] == len(sa)
            assert r["inter_sz"] == len(sa & sb)
            assert r["containment"] == r["inter_sz"] / r["a_sz"]
    # Jaccard at the same threshold misses the pair (union is huge)
    j = jaccard_join(docs, threshold=0.9, n=3).take_all()
    assert all({r["a"], r["b"]} != {1, 2} for r in j)


def test_containment_matches_brute_force(ray_session):
    import itertools

    import ray.data as rd

    from osmium_tool_ray.stages.dedup import containment_join

    rng = np.random.default_rng(11)
    base = [f"tok{i}" for i in range(60)]
    texts = []
    for _ in range(40):
        s = int(rng.integers(0, 40))
        e = s + int(rng.integers(4, 21))
        texts.append(" ".join(base[s:e]))     # overlapping slices nest
    docs = rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)]).repartition(4)
    t = 0.5
    out = {(r["a"], r["b"]): (r["inter_sz"], r["a_sz"])
           for r in containment_join(docs, threshold=t, n=3).take_all()}
    want = {}
    sets = [_shingles(t_) for t_ in texts]
    for a, b in itertools.permutations(range(40), 2):
        inter = len(sets[a] & sets[b])
        if inter / len(sets[a]) >= t:
            want[(a, b)] = (inter, len(sets[a]))
    assert out == want and len(want) > 0


def test_basket_pairs_symmetric_brute(ray_session):
    from collections import defaultdict

    from __ray_entry__ import q_basket_brand_pairs

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    bmap = dict(zip(part["p_partkey"], part["p_brand"]))
    per_order = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        per_order[ok].add(bmap[pk])
    want = defaultdict(int)
    for brands in per_order.values():
        bs = sorted(brands)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                want[(bs[i], bs[j])] += 1
    out = {(r["brand_a"], r["brand_b"]): r["support"]
           for r in q_basket_brand_pairs(SF).take_all()}
    assert out == dict(want) and len(out) > 0


def test_order_linecount_dist_total(ray_session):
    from __ray_entry__ import q_order_linecount_dist

    rows = q_order_linecount_dist(SF).take_all()
    n_orders = sum(r["n_orders"] for r in rows)
    n_lines = sum(r["n_lines"] * r["n_orders"] for r in rows)
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    assert n_lines == li.num_rows
    assert n_orders == len(set(li["l_orderkey"].to_pylist()))


def test_repeat_purchase_interval_matches_pandas(ray_session):
    from __ray_entry__ import q_repeat_purchase_interval

    df = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_custkey", "o_orderdate",
                                "o_orderkey"]).to_pandas()
    df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    df["us"] = df["o_orderdate"].astype("int64")
    want = {}
    for ck, g in df.groupby("o_custkey"):
        us = g["us"].to_numpy()
        if len(us) < 2:
            continue
        gaps = (us[1:] - us[:-1]) // 86_400_000_000
        want[ck] = (len(gaps), int(gaps.sum()), int(gaps.max()))
    out = {r["o_custkey"]: (r["n_gaps"], r["sum_gap_days"],
                            r["max_gap_days"])
           for r in q_repeat_purchase_interval(SF).take_all()}
    assert out == want and len(out) > 0
