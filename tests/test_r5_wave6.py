"""Round-5 wave 6: two-sample KS, first-3 paths, brightness-by-cell
(payload x spatial fusion)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _ks_brute(vc_g, vc_rest):
    """Tie-correct two-sample KS numerator over integer samples."""
    vals = np.unique(np.concatenate([vc_g, vc_rest]))
    cg = np.searchsorted(np.sort(vc_g), vals, side="right")
    cr = np.searchsorted(np.sort(vc_rest), vals, side="right")
    return int(np.abs(cg * len(vc_rest) - cr * len(vc_g)).max())


def test_ks_matches_brute(ray_session):
    from __ray_entry__ import q_ks_value_by_type

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    vc = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    types = df["event_type"].to_numpy()
    out = {r["event_type"]: (r["n_group"], r["n_rest"], r["d_num"],
                             r["ks"])
           for r in q_ks_value_by_type(SF).take_all()}
    assert set(out) == set(np.unique(types))
    for t in np.unique(types):
        g, rest = vc[types == t], vc[types != t]
        d = _ks_brute(g, rest)
        assert out[t][:3] == (len(g), len(rest), d), t
        assert out[t][3] == d / (float(len(g)) * float(len(rest)))


def test_ks_detects_planted_shift(ray_session):
    import ray.data as rd

    from osmium_tool_ray.pipelines.stats import ks_two_sample

    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, 2000)
    b = rng.normal(3, 1, 500)          # strongly shifted group
    ds = rd.from_items(
        [{"g": "base", "value": float(v)} for v in a]
        + [{"g": "shift", "value": float(v)} for v in b]).repartition(4)
    out = {r["g"]: r["ks"] for r in ks_two_sample(ds, "g", "value")
           .take_all()}
    assert out["shift"] > 0.8          # near-total separation
    # symmetric: each group vs rest of a two-group pop gives equal KS
    assert out["base"] == out["shift"]


def test_first3_paths_match_pandas(ray_session):
    from __ray_entry__ import q_first3_path_counts

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type",
                                "event_id"]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    want = {}
    for uid, g in df.groupby("user_id"):
        if len(g) < 3:
            continue
        p = ">".join(g["event_type"].iloc[:3])
        want[p] = want.get(p, 0) + 1
    out = {r["path"]: r["n_users"]
           for r in q_first3_path_counts(SF).take_all()}
    assert out == want and len(out) > 0


def test_brightness_by_cell_matches_numpy(ray_session):
    from __ray_entry__ import TILE_LEVEL, q_brightness_by_cell
    from osmium_tool_ray.functions.imagecodec import decode_batch
    from osmium_tool_ray.sources.corpus import images_dataset

    rows = images_dataset(SF, with_bytes=True,
                          columns=["image_id", "bytes", "lon", "lat"]) \
        .take_all()
    n6 = 1 << TILE_LEVEL
    want_sum, want_npx = {}, {}
    for r in rows:
        pix, w, h = decode_batch(pa.array([r["bytes"]],
                                          type=pa.binary()))
        x = min(max(int(np.floor((r["lon"] + 180.0) / 360.0 * n6)), 0),
                n6 - 1)
        y = min(max(int(np.floor((r["lat"] + 90.0) / 180.0 * n6)), 0),
                n6 - 1)
        key = (x, y)
        want_sum[key] = want_sum.get(key, 0) + int(pix.astype(np.int64)
                                                   .sum())
        want_npx[key] = want_npx.get(key, 0) + pix.shape[1]
    out = q_brightness_by_cell(SF).take_all()
    got = {(r["cell_x"], r["cell_y"]): (r["sum_brightness"],
                                        r["n_pixels"])
           for r in out}
    assert got == {k: (want_sum[k], want_npx[k]) for k in want_sum}
    for r in out:
        assert r["mean_brightness"] == (
            r["sum_brightness"] / float(r["n_pixels"]))
        assert 0.0 <= r["mean_brightness"] <= 255.0
