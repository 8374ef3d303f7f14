"""Golden parity with the reference derive-changes `normal` case
(/root/reference/test/derive-changes/CMakeLists.txt:13, input1.osm +
input2.osm -> output.osc): node 11 modified, node 13 deleted, node 14
created, way 21 modified — identical objects omitted from the change
file."""

import pyarrow as pa


def _ds(ids, versions, payload):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, type=pa.string()),
        "version": pa.array(versions, type=pa.int64()),
        "payload": pa.array(payload, type=pa.string()),
    }))


def test_derive_changes_golden_normal(ray_session):
    from osmium_tool_ray.pipelines.merge import derive_changes

    old = _ds(["n10", "n11", "n12", "n13", "w20", "w21", "r30"],
              [1] * 7,
              ["1,1", "2,1", "3,1", "4,1|foo=bar",
               "10,11,12|foo=bar", "12,13|xyz=abc", "n12,w20"])
    new = _ds(["n10", "n11", "n12", "n14", "w20", "w21", "r30"],
              [1, 2, 1, 1, 1, 2, 1],
              ["1,1", "2,2", "3,1", "5,1",
               "10,11,12|foo=bar", "12,14|xyz=new", "n12,w20"])
    out = derive_changes(old, new, ["id"], ["version", "payload"]) \
        .to_pandas()
    classes = dict(zip(out["id"], out["change"]))
    # output.osc: modify 11, delete 13, create 14, modify way 21
    assert classes["n11"] == "modified"
    assert classes["n13"] == "deleted"
    assert classes["n14"] == "created"
    assert classes["w21"] == "modified"
    # unchanged objects do not appear in a change file
    changed = out[out["change"] != "same"]["id"].tolist()
    assert sorted(changed) == ["n11", "n13", "n14", "w21"]
