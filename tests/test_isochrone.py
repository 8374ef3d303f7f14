"""isochrone_cells composition: counts -> occupied-cell graph ->
hop-bounded weighted SSSP, checked against the DuckDB recursive-CTE
oracle at sf0.001 (independent evaluation path) plus invariants."""
import duckdb

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def test_isochrone_matches_oracle_at_sf0001(ray_session):
    got = E.queries()["isochrone_cells"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(E.oracle_sql()["isochrone_cells"]).fetchdf()
    g = got.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    w = want.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    assert len(g) == len(w) > 0
    assert (g.values == w.values).all()
    # invariants: exactly one seed at distance 0; all within 6 max-w hops
    assert (g.dist == 0).sum() == 1
    assert g.dist.max() <= 6 * 7
