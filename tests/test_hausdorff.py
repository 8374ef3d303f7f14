"""hausdorff_to_ref (stages/spatial.hausdorff_to_ref) vs a per-key numpy
brute force: directed h(A,R)/h(R,A) and symmetric Hausdorff on exact
int64 squared distances, including chunk boundaries that split a key's
segment across inner chunks and across Ray blocks."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmium_tool_ray.stages.spatial import hausdorff_to_ref


def _brute(keys, x, y, rx, ry):
    out = {}
    for k in np.unique(keys):
        m = keys == k
        dx = x[m][:, None] - rx[None, :]
        dy = y[m][:, None] - ry[None, :]
        d2 = dx * dx + dy * dy
        h_ab = d2.min(axis=1).max()
        h_ba = d2.min(axis=0).max()
        out[int(k)] = (int(h_ab), int(h_ba), int(max(h_ab, h_ba)))
    return out


@pytest.mark.parametrize("chunk", [3, 8192])
def test_hausdorff_matches_brute_force(ray_session, chunk):
    rng = np.random.default_rng(11)
    n = 900
    keys = rng.integers(0, 40, n)
    x = rng.integers(-1000, 1000, n)
    y = rng.integers(-1000, 1000, n)
    rx = rng.integers(-1000, 1000, 25)
    ry = rng.integers(-1000, 1000, 25)
    ds = rd.from_arrow(pa.table({"k": keys, "x": x, "y": y})) \
        .repartition(7)  # split key segments across blocks
    got = hausdorff_to_ref(ds, "k", "x", "y",
                           np.column_stack([rx, ry]), chunk=chunk) \
        .to_pandas().set_index("k")
    want = _brute(keys, x, y, rx, ry)
    assert len(got) == len(want)
    for k, (ab, ba, sym) in want.items():
        row = got.loc[k]
        assert (row.h_ab, row.h_ba, row.h_sym) == (ab, ba, sym), k


def test_hausdorff_identical_track_is_zero(ray_session):
    x = np.array([0, 10, 20, 30], dtype=np.int64)
    y = np.array([5, 5, 5, 5], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": np.zeros(4, np.int64),
                                 "x": x, "y": y}))
    got = hausdorff_to_ref(ds, "k", "x", "y",
                           np.column_stack([x, y])).to_pandas()
    assert got.iloc[0].h_sym == 0


def test_hausdorff_empty_ref_returns_empty(ray_session):
    ds = rd.from_arrow(pa.table({"k": [1], "x": [0], "y": [0]}))
    got = hausdorff_to_ref(ds, "k", "x", "y",
                           np.empty((0, 2), dtype=np.int64))
    assert got.count() == 0
