"""blocks.py shared guards: bounded_rows (driver-fold row cap) and
pool_size (cluster-derived actor-pool sizing)."""

import pytest


def test_bounded_rows_under_cap(ray_session):
    import ray.data as rd

    from osmium_tool_ray.blocks import bounded_rows

    ds = rd.from_items([{"a": i} for i in range(10)])
    rows = bounded_rows(ds, 10, "test fold")
    assert sorted(r["a"] for r in rows) == list(range(10))


def test_bounded_rows_raises_over_cap(ray_session):
    import ray.data as rd

    from osmium_tool_ray.blocks import bounded_rows

    ds = rd.from_items([{"a": i} for i in range(100)])
    with pytest.raises(ValueError, match="exploding fold.*99-row bound"):
        bounded_rows(ds, 99, "exploding fold")


def test_pool_size(ray_session):
    from osmium_tool_ray.blocks import pool_size

    assert pool_size(7) == 7            # explicit pin wins
    derived = pool_size(None, frac=2)
    import ray
    cpus = int(ray.cluster_resources()["CPU"])
    assert derived == max(2, cpus // 2)
    assert pool_size(None, frac=10_000) == 2   # floor for tiny sessions
