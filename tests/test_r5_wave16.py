"""Round-5 wave 16: greedy max coverage vs brute force, global MAD."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_greedy_cover_matches_brute(ray_session):
    from collections import defaultdict

    from __ray_entry__ import TILE_LEVEL, q_greedy_cell_cover

    n6 = 1 << TILE_LEVEL
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    eid = df["event_id"].to_numpy()
    xf = ((eid * 7919) % 36000) * 100000 - 1800000000
    yf = ((eid * 104729) % 17000) * 100000 - 850000000
    x = np.clip((xf + 1800000000) * n6 // 3600000000, 0, n6 - 1)
    y = np.clip((yf + 850000000) * n6 // 1700000000, 0, n6 - 1)
    cell = x * n6 + y
    sets = defaultdict(set)
    for c, u in zip(cell, df["user_id"]):
        sets[int(c)].add(int(u))
    covered: set = set()
    want = []
    for k in range(5):
        best_c, best_g = None, -1
        for c in sorted(sets):
            g = len(sets[c] - covered)
            if g > best_g:
                best_c, best_g = c, g
        if best_g == 0:
            break
        covered |= sets[best_c]
        want.append((k + 1, best_c // n6, best_c % n6, best_g,
                     len(covered)))
    out = [(r["round"], r["cell_x"], r["cell_y"], r["gain"],
            r["covered_total"])
           for r in sorted(q_greedy_cell_cover(SF).take_all(),
                           key=lambda r: r["round"])]
    assert out == want and len(out) > 0
    # gains are non-increasing (submodularity of coverage)
    gains = [w[3] for w in want]
    assert all(b <= a for a, b in zip(gains, gains[1:]))


def test_global_mad_matches_numpy(ray_session):
    from __ray_entry__ import q_global_mad_value

    vc = (pq.read_table(f"{SF}/events.parquet", columns=["value"])
          .to_pandas()["value"] * 100).round().astype("int64") \
        .to_numpy()
    import math
    s = np.sort(vc)
    med = int(s[max(math.ceil(0.5 * len(s)) - 1, 0)])
    dev = np.sort(np.abs(vc - med))
    mad = int(dev[max(math.ceil(0.5 * len(dev)) - 1, 0)])
    out = q_global_mad_value(SF).take_all()[0]
    assert (out["median_vc"], out["mad_vc"]) == (med, mad)
