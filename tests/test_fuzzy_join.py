"""fuzzy_pairs_ed1 (stages/dedup.py): edit-distance<=1 join vs a
brute-force Levenshtein reference on adversarial word sets."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.dedup import fuzzy_pairs_ed1


def _lev(a, b):
    if abs(len(a) - len(b)) > 1:
        return 2
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ref(strs):
    out = {}
    ids = sorted(strs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = _lev(strs[a], strs[b])
            if d <= 1:
                out[(a, b)] = d
    return out


def _run(strs):
    tbl = pa.table({"doc_id": pa.array(sorted(strs), type=pa.int64()),
                    "s": pa.array([strs[k] for k in sorted(strs)])})
    df = fuzzy_pairs_ed1(rd.from_arrow(tbl).repartition(4),
                         width=16).to_pandas()
    return {(int(r.id_a), int(r.id_b)): int(r.dist)
            for r in df.itertuples()}


def test_fuzzy_adversarial_cases(ray_session):
    strs = {
        0: "kitten", 1: "sitten",          # substitution
        2: "kitte", 3: "kittens",          # deletion / insertion vs 0
        4: "kitten",                       # exact dup of 0
        5: "ab", 6: "ba",                  # transposition = dist 2: OUT
        7: "a", 8: "", 9: "b",             # tiny strings; ""~"a"~"b"
        10: "xyxyxyxyxyxyxyx",             # near-width loner
        11: "qq", 12: "qqq", 13: "qqqq",   # repeat ladder (chain)
    }
    got = _run(strs)
    want = _ref(strs)
    assert got == want
    assert (0, 4) in got and got[(0, 4)] == 0
    assert (5, 6) not in got               # transposition excluded
    assert got[(7, 8)] == 1 and got[(8, 9)] == 1 and got[(7, 9)] == 1


def test_fuzzy_random_words(ray_session):
    rng = np.random.default_rng(23)
    alpha = np.array(list("abc"))
    strs = {}
    for i in range(120):                   # tiny alphabet -> collisions
        L = int(rng.integers(1, 7))
        strs[i] = "".join(rng.choice(alpha, size=L))
    assert _run(strs) == _ref(strs)
