"""Golden parity with three reference suites not previously mirrored:

- /root/reference/test/diff (input1/input2 -> output-compact markers:
  ' '=unchanged, '-'=left-only, '+'=right-only, '*'=same-version content
  change; output-same -> identical; -c variant drops unchanged lines).
- /root/reference/test/removeid (input.osm minus prefixed id lists ->
  output-*.osm; referencing objects keep their untouched member refs).
- /root/reference/test/sort (output-simple type-then-id order; output-neg
  negative-id order — negatives first, ascending |id|, per libosmium
  object_order_type_id_version / command_sort.cpp:150; output-history
  id-then-version order).

Fixtures are transcribed (data only) into the engine's table model."""

import numpy as np
import pyarrow as pa


def _obj(kind, oid, version, uid, cs, hour, lat, lon, tags="", refs=""):
    return (kind, oid, version, uid, cs, hour, lat, lon, tags, refs)


# /root/reference/test/diff/input1.osm
DIFF_IN1 = [
    _obj("node", 10, 1, 1, 1, 1, 1.0, 1.0),
    _obj("node", 11, 1, 1, 1, 1, 2.0, 1.0),
    _obj("node", 12, 1, 1, 1, 1, 3.0, 1.0),
    _obj("node", 13, 1, 1, 1, 1, 4.0, 1.0),
    _obj("node", 15, 1, 2, 1, 2, 5.0, 1.0),
    _obj("node", 16, 1, 1, 1, 2, 5.0, 2.0),
    _obj("way", 20, 1, 1, 1, 1, 0.0, 0.0, "foo=bar", "n10,n11,n12"),
    _obj("way", 21, 1, 1, 1, 1, 0.0, 0.0, "xyz=abc", "n12,n13"),
    _obj("relation", 30, 1, 1, 1, 1, 0.0, 0.0, "", "n12@m1,w20@m2"),
]

# /root/reference/test/diff/input2.osm
DIFF_IN2 = [
    _obj("node", 10, 1, 1, 1, 1, 1.0, 1.0),
    _obj("node", 11, 2, 1, 2, 2, 2.0, 2.0),
    _obj("node", 12, 1, 1, 1, 1, 3.0, 1.0),
    _obj("node", 14, 1, 1, 2, 2, 5.0, 1.0),
    _obj("node", 15, 1, 1, 1, 2, 5.0, 1.0),
    _obj("node", 16, 1, 1, 1, 2, 5.0, 1.0),
    _obj("way", 20, 1, 1, 1, 1, 0.0, 0.0, "foo=bar", "n10,n11,n12"),
    _obj("way", 21, 2, 1, 2, 2, 0.0, 0.0, "xyz=new", "n12,n14"),
    _obj("relation", 30, 1, 1, 1, 1, 0.0, 0.0, "", "n12@m1,w20@m2"),
]

ID_COLS = ["kind", "id", "version"]
VALUE_COLS = ["uid", "changeset", "hour", "lat", "lon", "tags", "refs"]


def _table(rows):
    data = list(zip(*rows))
    return pa.table({
        "kind": pa.array(data[0], type=pa.string()),
        "id": pa.array(data[1], type=pa.int64()),
        "version": pa.array(data[2], type=pa.int64()),
        "uid": pa.array(data[3], type=pa.int64()),
        "changeset": pa.array(data[4], type=pa.int64()),
        "hour": pa.array(data[5], type=pa.int64()),
        "lat": pa.array(data[6], type=pa.float64()),
        "lon": pa.array(data[7], type=pa.float64()),
        "tags": pa.array(data[8], type=pa.string()),
        "refs": pa.array(data[9], type=pa.string()),
    })


def test_diff_golden_compact_markers(ray_session):
    """derive_changes classes == the output-compact marker per object:
    ' '->same, '-'->deleted, '+'->created, '*'->modified."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import derive_changes

    old = rd.from_arrow(_table(DIFF_IN1))
    new = rd.from_arrow(_table(DIFF_IN2))
    got = {(r["kind"], r["id"], r["version"]): r["change"]
           for r in derive_changes(old, new, ID_COLS, VALUE_COLS).take_all()}
    # transcribed from /root/reference/test/diff/output-compact
    expect = {
        ("node", 10, 1): "same",
        ("node", 11, 1): "deleted", ("node", 11, 2): "created",
        ("node", 12, 1): "same",
        ("node", 13, 1): "deleted", ("node", 14, 1): "created",
        ("node", 15, 1): "modified",          # *n15 v1 (uid 2 -> 1)
        ("node", 16, 1): "modified",          # *n16 v1 (lon 2 -> 1)
        ("way", 20, 1): "same",
        ("way", 21, 1): "deleted", ("way", 21, 2): "created",
        ("relation", 30, 1): "same",
    }
    assert got == expect


def test_diff_golden_summary_and_identical(ray_session):
    """diff_summary counts mirror output-compact line totals; the
    output-same case (file vs itself) sets the identical flag (exit-code-0
    contract, command_diff.cpp:293-396)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import diff_summary

    old = rd.from_arrow(_table(DIFF_IN1))
    new = rd.from_arrow(_table(DIFF_IN2))
    s = diff_summary(old, new, ID_COLS, VALUE_COLS)
    assert (s["created"], s["deleted"], s["modified"], s["same"]) == (3, 3, 2, 4)
    assert s["identical"] is False

    s2 = diff_summary(rd.from_arrow(_table(DIFF_IN1)),
                      rd.from_arrow(_table(DIFF_IN1)), ID_COLS, VALUE_COLS)
    assert s2["identical"] is True and s2["same"] == len(DIFF_IN1)


# ---------------------------------------------------------------- removeid

REMOVEID_OBJECTS = ["n10", "n11", "n12", "n13", "w20", "w21", "r30"]


def _removeid_ids(tokens):
    from osmium_tool_ray.pipelines.idops import parse_id_list

    d = parse_id_list(tokens)
    return np.concatenate([d["node"], d["way"], d["relation"]]) \
        if any(len(v) for v in d.values()) else np.asarray([], dtype=object)


def test_removeid_golden_cases(ray_session):
    """input.osm minus each reference id list == the output-*.osm object
    set; w21's member refs (still naming removed n12) are untouched —
    removeid never rewrites references (src/command_removeid, test
    fixtures output-n12w20.osm)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.idops import removeid

    refs_of = {"w20": "n10,n11,n12", "w21": "n12,n13", "r30": "n12@m1,w20@m2"}
    images = rd.from_arrow(pa.table({
        "image_id": pa.array(REMOVEID_OBJECTS, type=pa.string()),
        "refs": pa.array([refs_of.get(o, "") for o in REMOVEID_OBJECTS],
                         type=pa.string()),
    }))
    # (id-list tokens, expected surviving objects) per reference fixture
    cases = [
        (["n12", "w20"], ["n10", "n11", "n13", "w21", "r30"]),  # n12w20.ids
        (["n11", "n12"], ["n10", "n13", "w20", "w21", "r30"]),
        (["r30"], ["n10", "n11", "n12", "n13", "w20", "w21"]),
        (["n10", "w21"], ["n11", "n12", "n13", "w20", "r30"]),
    ]
    for tokens, expect in cases:
        out = removeid(images, _removeid_ids(tokens)) \
            .to_pandas().sort_values("image_id")
        assert sorted(out["image_id"]) == sorted(expect), tokens
        # refs of survivors are byte-identical to the input
        for _, row in out.iterrows():
            assert row["refs"] == refs_of.get(row["image_id"], "")


# -------------------------------------------------------------------- sort

KR = {"node": 0, "way": 1, "relation": 2}


def _sort_rows(rows):
    """rows: (kind, id, version). Adds the libosmium id-order key:
    negative ids first, ordered by |id| (object_comparisons.hpp id_order;
    proven by output-neg.osm)."""
    return pa.table({
        "kind": pa.array([r[0] for r in rows], type=pa.string()),
        "krank": pa.array([KR[r[0]] for r in rows], type=pa.int64()),
        "neg": pa.array([0 if r[1] < 0 else 1 for r in rows], type=pa.int64()),
        "absid": pa.array([abs(r[1]) for r in rows], type=pa.int64()),
        "id": pa.array([r[1] for r in rows], type=pa.int64()),
        "version": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def _sorted_ids(ds):
    from osmium_tool_ray.pipelines.merge import sort_dataset

    df = sort_dataset(ds, ["krank", "neg", "absid", "version"]).to_pandas()
    return list(zip(df["kind"], df["id"], df["version"]))


def test_sort_golden_simple_two_inputs(ray_session):
    """input-simple1 + input-simple2 -> output-simple.osm ordering."""
    import ray.data as rd

    in1 = [("node", 11, 1), ("node", 10, 1), ("relation", 30, 1)]
    in2 = [("node", 12, 1), ("way", 21, 1), ("way", 20, 1), ("node", 13, 1)]
    ds = rd.from_arrow(_sort_rows(in1)).union(rd.from_arrow(_sort_rows(in2)))
    assert _sorted_ids(ds) == [
        ("node", 10, 1), ("node", 11, 1), ("node", 12, 1), ("node", 13, 1),
        ("way", 20, 1), ("way", 21, 1), ("relation", 30, 1)]


def test_sort_golden_negative_ids(ray_session):
    """input-neg.osm -> output-neg.osm: negatives before positives,
    negatives ordered by ascending absolute value (-10 before -11)."""
    import ray.data as rd

    rows = [("node", 11, 1), ("node", 10, 1), ("node", -11, 1),
            ("relation", 30, 1), ("node", 12, 1), ("node", -10, 1),
            ("way", 21, 1), ("way", 22, 1), ("way", -22, 1)]
    assert _sorted_ids(rd.from_arrow(_sort_rows(rows))) == [
        ("node", -10, 1), ("node", -11, 1), ("node", 10, 1),
        ("node", 11, 1), ("node", 12, 1),
        ("way", -22, 1), ("way", 21, 1), ("way", 22, 1),
        ("relation", 30, 1)]


def test_sort_golden_history_versions(ray_session):
    """input-history1 + input-history2 -> output-history.osm: versions of
    one id stay adjacent and ascending."""
    import ray.data as rd

    in1 = [("node", 11, 1), ("node", 11, 2), ("node", 10, 1),
           ("node", 12, 2), ("way", 21, 1)]
    in2 = [("node", 10, 2), ("node", 13, 2), ("node", 13, 1),
           ("node", 12, 1)]
    ds = rd.from_arrow(_sort_rows(in1)).union(rd.from_arrow(_sort_rows(in2)))
    assert _sorted_ids(ds) == [
        ("node", 10, 1), ("node", 10, 2), ("node", 11, 1), ("node", 11, 2),
        ("node", 12, 1), ("node", 12, 2), ("node", 13, 1), ("node", 13, 2),
        ("way", 21, 1)]
