"""Extension registries (osmium_tool_ray/registry.py — SURVEY §2.9): a
user-registered extract strategy runs through run_extract with no engine
edits, built-ins resolve through the same table, unknown names fail with
the registered list, and sink suffix dispatch picks the right writer."""

import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.registry import (
    get_strategy, register_sink, register_strategy, registered_strategies,
    resolve_sink,
)


def test_builtins_registered():
    assert {"simple", "complete_ways", "complete_ways_with_history",
            "smart"} <= set(registered_strategies())


def test_unknown_strategy_lists_registered():
    with pytest.raises(ValueError, match="Unknown strategy 'bogus'"):
        get_strategy("bogus")


def test_custom_strategy_through_run_extract(ray_session):
    """A strategy that marks EVERY way whose first member is any matched
    node (ignoring kind) — nonsense semantics, but it proves the plug-in
    point: registered here, picked up by name inside run_extract."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.extract import run_extract
    from osmium_tool_ray.state.regions import parse_extract_config

    calls = {}

    @register_strategy("grab_everything")
    def grab_everything(sets, groups_ds, members_ds, mem, kind_of, options,
                        do_relations):
        calls["options"] = dict(options)
        for e in range(len(sets.way_ids)):
            sets.way_ids[e] = np.asarray(
                [g for g, k in kind_of.items() if k == "way"], dtype=str)

    images = rd.from_arrow(pa.table({
        "image_id": [f"img{i:010d}" for i in range(8)],
        "lon": [float(i) for i in range(8)],
        "lat": [0.5] * 8,
    }))
    groups = rd.from_arrow(pa.table({
        "group_id": ["w1", "w2", "r1"],
        "kind": ["way", "way", "relation"],
    }))
    members = rd.from_arrow(pa.table({
        "group_id": ["w1", "w2", "r1"],
        "seq": pa.array([0, 0, 0], type=pa.int32()),
        "mtype": ["node", "node", "way"],
        "ref": ["img0000000001", "img0000000002", "w1"],
    }))
    regions = parse_extract_config(
        {"extracts": [{"output": "a", "bbox": [-1, -1, 3, 3]}]})
    out = run_extract(images, regions, groups, members,
                      strategy="grab_everything", options={"marker": 1})
    assert calls["options"] == {"marker": 1}
    got_ways = {r["group_id"] for r in out["group_rows"].to_pylist()
                if r["kind"] == "way"}
    assert got_ways == {"w1", "w2"}


def test_sink_suffix_dispatch(tmp_path):
    hits = []

    @register_sink(".weird")
    def _weird(ds, path, **kw):
        hits.append(path)

    from osmium_tool_ray.sources.readers import write_table

    class FakeDS:
        def write_parquet(self, path, **kw):
            hits.append(("parquet", path))

    write_table(FakeDS(), "/tmp/out.weird")
    write_table(FakeDS(), str(tmp_path / "out.dir"))
    assert hits[0] == "/tmp/out.weird"
    assert hits[1][0] == "parquet"
    # longest suffix wins
    @register_sink(".x.weird")
    def _xweird(ds, path, **kw):
        hits.append(("x", path))

    write_table(FakeDS(), "/tmp/a.x.weird")
    assert hits[2][0] == "x"
