"""Gaps-and-islands interval union (pipelines/windows.interval_coverage)
vs a brute-force per-key merge, plus touching/contained edge cases."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmium_tool_ray.pipelines.windows import interval_coverage


def _brute(rows):
    from collections import defaultdict
    iv = defaultdict(list)
    for key, a, b in rows:
        iv[key].append((a, b))
    out = {}
    for key, lst in iv.items():
        lst.sort()
        merged = []
        for a, b in lst:
            if merged and a <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        out[key] = (len(merged), sum(b - a for a, b in merged))
    return out


def _run(rows, **kw):
    tbl = pa.table({
        "key": pa.array([r[0] for r in rows], type=pa.int64()),
        "s": pa.array([r[1] for r in rows], type=pa.int64()),
        "e": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    ds = rd.from_arrow(tbl)
    out = interval_coverage(ds, "key", "s", "e", **kw).to_pandas()
    return {int(r.key): (int(r.n_islands), int(r.covered))
            for r in out.itertuples()}


def test_random_parity():
    rng = np.random.default_rng(11)
    rows = []
    for key in range(60):
        for _ in range(int(rng.integers(0, 15))):
            s = int(rng.integers(0, 5000))
            rows.append((key, s, s + int(rng.integers(1, 300))))
    assert _run(rows, buckets=7) == _brute(rows)


def test_touching_merge_and_containment():
    rows = [
        (1, 0, 10), (1, 10, 20),        # touching -> one island
        (2, 0, 100), (2, 20, 30),       # contained -> one island, 100
        (3, 0, 5), (3, 10, 15),         # gap -> two islands
        (4, 7, 8),                      # singleton
    ]
    got = _run(rows, buckets=3)
    assert got == {1: (1, 20), 2: (1, 100), 3: (2, 10), 4: (1, 1)}


def test_duplicate_intervals():
    rows = [(9, 5, 9)] * 4 + [(9, 9, 12)]
    assert _run(rows, buckets=2) == {9: (1, 7)}
