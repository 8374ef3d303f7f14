"""Regression tests for review findings: hot-bucket pair recall,
merge-changes tie duplication, change-order last-wins, closed-fragment
ring contract, empty-region Dataset extract."""

import numpy as np
import pyarrow as pa
import pytest


def test_hot_bucket_chain_recovers_identical_pair(ray_session):
    """A hot LSH bucket (> all_pairs_cap members) whose min-id star hub is
    NOT a near-dup of two identical members must still emit their pair:
    the sig64-sorted chain makes identical members adjacent."""
    import ray.data as rd

    from osmium_tool_ray.stages.dedup import _bucket_pairs

    n = 12
    ids = [f"d{i:02d}" for i in range(n)]
    # d10 and d11 share the full-signature sketch; everyone else distinct
    sig64 = list(range(100, 100 + n))
    sig64[11] = sig64[10]
    rows = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.string()),
        "band_id": pa.array([0] * n, type=pa.int32()),
        "band_hash": pa.array([42] * n, type=pa.int64()),
        "sig64": pa.array(sig64, type=pa.int64()),
    }))
    pairs = _bucket_pairs(rows, ["band_id", "band_hash"], "doc_id",
                          pa.string(), all_pairs_cap=8, sig_col="sig64")
    got = set()
    for t in (pairs.to_arrow_refs() and
              [x for x in __import__("ray").get(pairs.to_arrow_refs())]):
        got.update(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    # star pairs from the hub still present
    assert ("d00", "d11") in got
    # the chain pair the star missed
    assert ("d10", "d11") in got


def test_merge_changes_simplify_overlapping_files(ray_session):
    """The same (id, version) row in two change files must come out ONCE
    (the packed-Max path would emit both; the default must dedup)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import merge_changes_simplify

    c1 = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "version": pa.array([1, 3], type=pa.int64()),
        "value": pa.array([10.0, 30.0]),
    }))
    c2 = rd.from_arrow(pa.table({
        "event_id": pa.array([2], type=pa.int64()),
        "version": pa.array([3], type=pa.int64()),
        "value": pa.array([30.0]),
    }))
    out = merge_changes_simplify([c1, c2], ["event_id"]).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[out.event_id == 2, "version"].tolist() == [3]


def test_apply_location_changes_last_wins(ray_session):
    """modify-then-delete for the same node must DELETE the member (the
    reference applies change inputs in order; later changes override)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.locations import apply_location_changes

    located = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1", "w1"], type=pa.string()),
        "seq": pa.array([0, 1], type=pa.int32()),
        "ref": pa.array(["n1", "n2"], type=pa.string()),
        "lon": pa.array([1.0, 2.0]),
        "lat": pa.array([1.0, 2.0]),
    }))
    changes = rd.from_arrow(pa.table({
        "image_id": pa.array(["n1", "n1"], type=pa.string()),
        "lon": pa.array([9.0, 0.0]),
        "lat": pa.array([9.0, 0.0]),
        "op": pa.array(["modify", "delete"], type=pa.string()),
    }))
    out = apply_location_changes(located, changes, id_col="image_id") \
        .to_pandas().sort_values("ref").reset_index(drop=True)
    assert out["ref"].tolist() == ["n2"]
    # and delete-then-modify keeps the member with the modified coords
    changes2 = rd.from_arrow(pa.table({
        "image_id": pa.array(["n1", "n1"], type=pa.string()),
        "lon": pa.array([0.0, 9.0]),
        "lat": pa.array([0.0, 9.0]),
        "op": pa.array(["delete", "modify"], type=pa.string()),
    }))
    out2 = apply_location_changes(located, changes2, id_col="image_id") \
        .to_pandas().sort_values("ref").reset_index(drop=True)
    assert out2["ref"].tolist() == ["n1", "n2"]
    assert out2.loc[out2.ref == "n1", "lon"].tolist() == [9.0]


def test_assemble_rings_closed_fragment_contract():
    """A single fragment closed in fixed-point but not in float must come
    back with ring[0] == ring[-1]; a degenerate 3-point [A,B,A] fragment
    is rejected (zero area), matching the stitched branch."""
    from osmium_tool_ray.functions.geometry import assemble_rings

    frag = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [4e-9, 4e-9]]
    rings, leftover = assemble_rings([frag])
    assert len(rings) == 1 and not leftover
    assert np.array_equal(rings[0][0], rings[0][-1])

    rings3, leftover3 = assemble_rings([[[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]]])
    assert rings3 == [] and leftover3 == [0]


def test_extract_cw_dataset_empty_region(ray_session):
    """A region matching zero images must return an empty extract, not
    crash Ray's join on a schema-less empty side."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.extract import run_extract_cw_dataset
    from osmium_tool_ray.sources.corpus import images_dataset
    from osmium_tool_ray.state.regions import Region

    sf = "/root/testdata/sf0.001"
    images = images_dataset(sf, columns=["image_id", "lon", "lat"])
    groups = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1"], type=pa.string()),
        "kind": pa.array(["way"], type=pa.string()),
    }))
    members = rd.from_arrow(pa.table({
        "group_id": pa.array(["w1"], type=pa.string()),
        "seq": pa.array([0], type=pa.int32()),
        "mtype": pa.array(["node"], type=pa.string()),
        "ref": pa.array(["img0000000001"], type=pa.string()),
    }))
    # bbox in the middle of the Pacific gap of the synthetic lon/lat grid:
    # the derive arithmetic only lands on .01-degree lattice points, so an
    # interval narrower than the lattice spacing is guaranteed empty
    region = Region(name="none", kind="bbox",
                    bbox=(-179.9999, -84.9999, -179.9991, -84.9991))
    res = run_extract_cw_dataset(images, [region], groups=groups,
                                 members=members)
    assert res["images_out"].count() == 0
    assert res["group_rows"].num_rows == 0
