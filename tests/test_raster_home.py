"""gaussian_smooth_cells vs a dense scipy-free 2D reference convolution,
and home_cells_user tie determinism on a planted layout."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

import __ray_entry__ as E
from osmium_tool_ray.stages.raster import gaussian_smooth_cells


def test_gaussian_smooth_matches_dense_convolution(ray_session):
    rng = np.random.default_rng(41)
    n = 2000
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-89, 89, n)
    ds = rd.from_arrow(pa.table({"lon": lon, "lat": lat})).repartition(5)
    got = gaussian_smooth_cells(ds, level=5).to_pandas()
    # dense reference on the 32x32 grid
    g = np.int64(1) << 5
    x = np.clip(np.floor((lon + 180) / 360 * g).astype(int), 0, g - 1)
    y = np.clip(np.floor((lat + 90) / 180 * g).astype(int), 0, g - 1)
    raw = np.zeros((g, g), dtype=np.int64)
    np.add.at(raw, (x, y), 1)
    w = np.array([1, 4, 6, 4, 1], dtype=np.int64)
    k = w[:, None] * w[None, :]
    out = np.zeros((g, g), dtype=np.int64)
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            sx = slice(max(0, dx), g + min(0, dx))
            tx = slice(max(0, -dx), g + min(0, -dx))
            sy = slice(max(0, dy), g + min(0, dy))
            ty = slice(max(0, -dy), g + min(0, -dy))
            out[sx, sy] += raw[tx, ty] * k[dx + 2, dy + 2]
    want = {(i, j): out[i, j] for i in range(g) for j in range(g)
            if out[i, j] > 0}
    got_map = {(r.cell_x, r.cell_y): r.smoothed for r in got.itertuples()}
    assert got_map == want


def test_home_cells_tie_rule(ray_session, tmp_path):
    # user 1 visits two cells equally often: smallest (cell_x, cell_y)
    # must win; event_id lattice coords are fixed, so plant via events
    # that land in known cells is brittle — instead drive the real query
    # and check the argmax property against a recount
    got = E.queries()["home_cells_user"]("/root/testdata/sf0.001") \
        .to_pandas()
    assert len(got) > 0 and got.user_id.is_unique
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet')")
    want = con.execute(E.oracle_sql()["home_cells_user"]).fetchdf()
    g = got.sort_values("user_id").reset_index(drop=True)
    w = want.sort_values("user_id").reset_index(drop=True)
    assert (g.values == w.values).all()
