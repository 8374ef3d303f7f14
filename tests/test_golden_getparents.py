"""Golden parity with the reference getparents suite
(/root/reference/test/getparents/CMakeLists.txt): input.osm with
requested sets n10 / n12 / w20, plus --add-self — expected parent id
sets transcribed from out-*.osm."""

import numpy as np
import pyarrow as pa


def _members():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "group_id": pa.array(["w20"] * 3 + ["w21"] * 2 + ["r30"] * 2,
                             type=pa.string()),
        "seq": pa.array([0, 1, 2, 0, 1, 0, 1], type=pa.int32()),
        "mtype": pa.array(["node"] * 5 + ["node", "way"], type=pa.string()),
        "ref": pa.array(["n10", "n11", "n12", "n12", "n13", "n12", "w20"],
                        type=pa.string()),
    }))


def _gids(tbl):
    return sorted(tbl["group_id"].to_pylist())


def test_getparents_golden(ray_session):
    from osmium_tool_ray.pipelines.idops import getparents

    m = _members()
    # n10 -> way 20 only (out-n10.osm)
    assert _gids(getparents(m, {"node": np.asarray(["n10"])})) == ["w20"]
    # n12 -> ways 20+21 and relation 30 (out-n12.osm)
    assert _gids(getparents(m, {"node": np.asarray(["n12"])})) == \
        ["r30", "w20", "w21"]
    # w20 -> relation 30 only (out-w20.osm)
    assert _gids(getparents(m, {"way": np.asarray(["w20"])})) == ["r30"]
    # --add-self for w20: the requested way itself joins the output
    # (out-w20-s.osm: way 20 + relation 30)
    assert _gids(getparents(m, {"way": np.asarray(["w20"])},
                            add_self=True)) == ["r30", "w20"]
