"""Per-row invariants hold through a multi-stage pipeline (FIXTURES.md:
caption byte-equality, phash unchanged, PSNR>=40dB after every stage)."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.stages.extract import CellEncode, RegionMatcher
from osmium_tool_ray.stages.invariants import InvariantCheck
from osmium_tool_ray.state.regions import parse_extract_config


def test_invariants_through_pipeline(ray_session):
    from osmium_tool_ray.sources.corpus import images_dataset
    import ray

    regions = parse_extract_config({"extracts": [
        {"output": "half", "bbox": [-180, -85, 0, 85]}]})
    ds = images_dataset("/root/testdata/sf0.001", with_bytes=True)
    ds = ds.map_batches(InvariantCheck(), batch_format="pyarrow")   # after synth
    ds = ds.map_batches(CellEncode(level=8), batch_format="pyarrow")
    ds = ds.map_batches(InvariantCheck(), batch_format="pyarrow")   # after encode
    ds = ds.map_batches(RegionMatcher, fn_constructor_args=(ray.put(regions),),
                        batch_format="pyarrow", concurrency=2)
    out = ds.map_batches(InvariantCheck(), batch_format="pyarrow")  # after join
    assert out.count() > 0  # raises inside the stage on any violation


def test_invariant_check_catches_corruption(ray_session):
    import ray.data as rd
    from osmium_tool_ray.sources.corpus import images_from_range_batch

    tbl = images_from_range_batch({"id": np.arange(20)}, with_bytes=False)
    # corrupt one phash
    ph = tbl["phash"].to_pylist()
    ph[3] += 1
    bad = tbl.set_column(tbl.schema.get_field_index("phash"), "phash",
                         pa.array(ph, type=pa.int64()))
    chk = InvariantCheck()
    with pytest.raises(ValueError, match="invariant violation"):
        chk(bad)
    flagged = InvariantCheck(mode="flag")(bad)
    assert flagged["invariants_ok"].to_pylist().count(False) == 1
    # corrupt a caption id
    cap = tbl["caption"].to_pylist()
    cap[5] = "caption 999999 view"
    bad2 = tbl.set_column(tbl.schema.get_field_index("caption"), "caption",
                          pa.array(cap, type=pa.string()))
    with pytest.raises(ValueError):
        chk(bad2)
