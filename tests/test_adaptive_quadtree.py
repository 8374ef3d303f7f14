"""adaptive_quadtree (stages/tiles.adaptive_quadtree) invariants on the
synthetic corpus: output cells partition the points exactly (counts sum
to the corpus size), every non-max-depth cell is under threshold, and
every deeper cell sits under a hot ancestor."""
import numpy as np

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"
T = 32


def test_quadtree_partitions_points(ray_session):
    got = E.queries()["adaptive_quadtree"](SF).to_pandas()
    assert got.n.sum() == 1000                     # sf0.001 corpus size
    lv4 = got[got.level == 4]
    lv6 = got[got.level == 6]
    lv8 = got[got.level == 8]
    assert (lv4.n <= T).all() and (lv6.n <= T).all()
    # every level-6 cell's level-4 parent was hot (absent from output)
    out4 = set(zip(lv4.cell_x, lv4.cell_y))
    for x, y in zip(lv6.cell_x, lv6.cell_y):
        assert (x // 4, y // 4) not in out4
    # every level-8 cell's level-6 parent was hot (absent from output)
    out6 = set(zip(lv6.cell_x, lv6.cell_y))
    for x, y in zip(lv8.cell_x, lv8.cell_y):
        assert (x // 4, y // 4) not in out6
    # no duplicate cells within a level
    for lv in (lv4, lv6, lv8):
        assert not lv.duplicated(["cell_x", "cell_y"]).any()


def test_quadtree_validates_levels(ray_session):
    import pytest
    import ray.data as rd
    import pyarrow as pa

    from osmium_tool_ray.stages.tiles import adaptive_quadtree

    ds = rd.from_arrow(pa.table({"lon": [0.0], "lat": [0.0]}))
    with pytest.raises(ValueError):
        adaptive_quadtree(ds, (6, 6, 8), 10)
