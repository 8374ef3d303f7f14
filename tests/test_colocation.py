"""colocation_pairs query composition: within-radius pairs -> bucketed
type attach -> canonical type-pair counts, pinned against a brute-force
cross join on a small planted layout."""
import numpy as np

import __ray_entry__ as E


def test_colocation_canonical_counts_match_brute(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # plant events so coords (event_id-derived lattice) put some pairs
    # within radius: reuse the real derivation, brute-force it here
    # (2000 contiguous ids yield ~1150 within-radius pairs)
    n = 2000
    eid = np.arange(n, dtype=np.int64)
    types = np.array(["a", "b", "c"])[eid % 3]
    ts = pa.array(np.full(n, 10**15), type=pa.int64()) \
        .cast(pa.timestamp("us"))
    tbl = pa.table({"event_id": eid, "ts": ts,
                    "user_id": eid % 7,
                    "event_type": pa.array(types.tolist()),
                    "value": pa.array(np.ones(n)),
                    "props": pa.array([""] * n)})
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = E.queries()["colocation_pairs"](str(tmp_path)).to_pandas()

    xf = ((eid * 7919) % 36000) * 100000 - 1800000000
    yf = ((eid * 104729) % 17000) * 100000 - 850000000
    # prefilter on |dx|,|dy| BEFORE squaring: raw dx spans 3.6e9 whose
    # square overflows int64
    cand = (np.abs(xf[:, None] - xf[None, :]) <= 20_000_000) \
        & (np.abs(yf[:, None] - yf[None, :]) <= 20_000_000) \
        & (eid[:, None] < eid[None, :])
    ii, jj = np.where(cand)
    d2 = (xf[ii] - xf[jj]) ** 2 + (yf[ii] - yf[jj]) ** 2
    keep = d2 <= 400000000000000
    ii, jj = ii[keep], jj[keep]
    want: dict = {}
    for i, j in zip(ii, jj):
        key = tuple(sorted((types[i], types[j])))
        want[key] = want.get(key, 0) + 1
    got_map = {(r.type_a, r.type_b): r.n_pairs for r in got.itertuples()}
    assert got_map == want
    assert all(a <= b for a, b in got_map)      # canonical order
