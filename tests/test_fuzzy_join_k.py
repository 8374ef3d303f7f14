"""fuzzy_pairs_edk (stages/dedup.py): edit-distance<=k join (PassJoin
segment blocking + banded-DP verify) vs brute-force Levenshtein on
adversarial word sets, for k=2 and k=3."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.stages.dedup import fuzzy_pairs_edk


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ref(strs, k):
    out = {}
    ids = sorted(strs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = _lev(strs[a], strs[b])
            if d <= k:
                out[(a, b)] = d
    return out


def _run(strs, k, width=16):
    tbl = pa.table({"doc_id": pa.array(sorted(strs), type=pa.int64()),
                    "s": pa.array([strs[kk] for kk in sorted(strs)])})
    df = fuzzy_pairs_edk(rd.from_arrow(tbl).repartition(4),
                         k=k, width=width).to_pandas()
    return {(int(r.id_a), int(r.id_b)): int(r.dist)
            for r in df.itertuples()}


def test_edk_adversarial_cases(ray_session):
    strs = {
        0: "kitten", 1: "sitting",         # the classic: dist 3
        2: "kitte", 3: "kittens",          # 1-indel ladder
        4: "kitten",                       # exact dup of 0
        5: "ab", 6: "ba",                  # transposition = dist 2: IN at k=2
        7: "a", 8: "", 9: "bc",            # short-string carve-out
        10: "xyxyxyxyxyxyxyx",             # near-width loner
        11: "qq", 12: "qqqq", 13: "qqqqqq",  # +2 repeat ladder
        14: "abcdefgh", 15: "axcdxfgh",    # two substitutions
        16: "abcdefgh"[::-1],              # reversal: far
    }
    got = _run(strs, k=2)
    want = _ref(strs, 2)
    assert got == want
    assert got[(5, 6)] == 2                # transposition now included
    assert (0, 1) not in got               # dist 3 excluded at k=2
    assert got[(14, 15)] == 2
    got3 = _run(strs, k=3)
    assert got3 == _ref(strs, 3)
    assert got3[(0, 1)] == 3               # kitten~sitting at k=3


def test_edk_random_words(ray_session):
    rng = np.random.default_rng(37)
    alpha = np.array(list("abc"))
    strs = {}
    for i in range(120):                   # tiny alphabet -> collisions
        L = int(rng.integers(0, 9))
        strs[i] = "".join(rng.choice(alpha, size=L))
    assert _run(strs, k=2) == _ref(strs, 2)


def test_edk_longer_random(ray_session):
    rng = np.random.default_rng(41)
    alpha = np.array(list("abcdef"))
    strs = {}
    for i in range(100):
        L = int(rng.integers(4, 17))
        strs[i] = "".join(rng.choice(alpha, size=L))
    # plant known k=2 variants
    strs[200] = strs[0][:1] + "z" + strs[0][2:] + "z"
    strs[201] = strs[1][2:]                # 2-char prefix deletion
    assert _run(strs, k=2) == _ref(strs, 2)
