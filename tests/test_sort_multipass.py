"""sort 'simple' vs 'multipass' parity (test/sort/CMakeLists.txt:10-17
asserts both strategies produce identical output): Ray's distributed sort
must equal a per-kind partitioned sort concatenated in kind order."""

import numpy as np
import pyarrow as pa

from osmium_tool_ray.pipelines.idops import ids_from_dataset
from osmium_tool_ray.pipelines.merge import sort_dataset


def test_sort_single_equals_multipass(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)
    kinds = np.array(["node", "relation", "way"])[rng.integers(0, 3, 500)]
    ids = rng.integers(0, 10_000, 500)
    ds = rd.from_arrow(pa.table({
        "kind": pa.array(kinds), "id": pa.array(ids),
        "payload": pa.array(rng.integers(0, 99, 500)),
    }))
    # single global sort (the reference's 'simple' strategy equivalent)
    single = [(r["kind"], r["id"], r["payload"])
              for r in sort_dataset(ds, ["kind", "id", "payload"]).take_all()]
    # multipass: one sorted pass per entity kind, concatenated in kind order
    multi = []
    for kind in ("node", "relation", "way"):
        part = ds.filter(expr=f"kind == '{kind}'")
        multi += [(r["kind"], r["id"], r["payload"])
                  for r in sort_dataset(part, ["id", "payload"]).take_all()]
    assert single == multi


def test_ids_from_dataset(ray_session):
    import ray.data as rd

    other = rd.from_items([{"image_id": "b"}, {"image_id": "a"}, {"image_id": "b"}])
    assert ids_from_dataset(other).tolist() == ["a", "b"]
