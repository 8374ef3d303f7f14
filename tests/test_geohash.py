"""Geohash encoding (functions/cells.geohash_encode): published test
vectors, prefix-nesting property, bijection to the lon/lat bin grid."""

import numpy as np
import pytest

from osmium_tool_ray.functions.cells import geohash_encode


def test_geohash_known_vectors():
    # canonical published examples at their published precisions
    assert geohash_encode(np.array([10.40744]), np.array([57.64911]),
                          11).tolist() == ["u4pruydqqvj"]
    assert geohash_encode(np.array([-5.6]), np.array([42.6]),
                          5).tolist() == ["ezs42"]
    assert geohash_encode(np.array([112.5584]), np.array([37.8324]),
                          9).tolist() == ["ww8p1r4t8"]
    # origin: all-zero bits -> alternating base32(0b01010/0b10101)
    assert geohash_encode(np.array([0.0]), np.array([0.0]),
                          6).tolist() == ["s00000"]


def test_geohash_prefix_nesting():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    g9 = geohash_encode(lon, lat, 9)
    for p in (1, 4, 6):
        gp = geohash_encode(lon, lat, p)
        assert all(a.startswith(b) for a, b in zip(g9, gp))


def test_geohash_bijection_to_grid():
    """precision-4 geohash = 20 bits = 10 lon bits x 10 lat bits: two
    points share a geohash iff they share the 1024x1024 lon/lat bin."""
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    gh = geohash_encode(lon, lat, 4)
    x = np.floor((lon + 180.0) / 360.0 * 1024).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * 1024).astype(np.int64)
    key = x << 32 | y
    by_gh = {}
    for g, k in zip(gh, key):
        by_gh.setdefault(g, set()).add(int(k))
    assert all(len(v) == 1 for v in by_gh.values())
    assert len(by_gh) == len(set(key.tolist()))


def test_geohash_precision_bounds():
    with pytest.raises(ValueError):
        geohash_encode(np.array([0.0]), np.array([0.0]), 13)
