"""Golden parity with the reference merge-changes suite
(/root/reference/test/merge-changes/CMakeLists.txt): change1.osc (creates
n10-n13, w20, w21, r30) + change2.osc (modify n11/w21 v2, delete n13 v2,
create n14) -> merged.osc (all versions kept) and simplified.osc
(--simplify: last version per object only), plus the only-version metadata
variants (object selection identical when metadata attributes are absent,
merged-*-only-version.osc / simplified-*-only-version.osc)."""

import pyarrow as pa
import pytest


def _rows(kinds, ids, versions, ops, with_meta=True):
    n = len(ids)
    return pa.table({
        "type": pa.array(kinds),
        "id": pa.array(ids, type=pa.int64()),
        "version": pa.array(versions, type=pa.int64()),
        "op": pa.array(ops),
        "uid": pa.array([1] * n if with_meta else [None] * n,
                        type=pa.int64()),
    })


def _change1(with_meta=True):
    # /root/reference/test/merge-changes/change1.osc — all <create> v1
    return _rows(
        ["node"] * 4 + ["way"] * 2 + ["relation"],
        [10, 11, 12, 13, 20, 21, 30],
        [1] * 7,
        ["create"] * 7,
        with_meta)


def _change2(with_meta=True):
    # change2.osc — modify n11 v2, delete n13 v2, create n14 v1, modify w21 v2
    return _rows(
        ["node", "node", "node", "way"],
        [11, 13, 14, 21],
        [2, 2, 1, 2],
        ["modify", "delete", "create", "modify"],
        with_meta)


MERGED = [  # merged.osc: every version, (type,id,version) sorted
    ("node", 10, 1, "create"), ("node", 11, 1, "create"),
    ("node", 11, 2, "modify"), ("node", 12, 1, "create"),
    ("node", 13, 1, "create"), ("node", 13, 2, "delete"),
    ("node", 14, 1, "create"),
    ("way", 20, 1, "create"), ("way", 21, 1, "create"),
    ("way", 21, 2, "modify"),
    ("relation", 30, 1, "create"),
]

SIMPLIFIED = [  # simplified.osc: last version per object only
    ("node", 10, 1, "create"), ("node", 11, 2, "modify"),
    ("node", 12, 1, "create"), ("node", 13, 2, "delete"),
    ("node", 14, 1, "create"),
    ("way", 20, 1, "create"), ("way", 21, 2, "modify"),
    ("relation", 30, 1, "create"),
]

_TYPE_ORDER = {"node": 0, "way": 1, "relation": 2}


def _sorted_rows(ds):
    rows = [(r["type"], r["id"], r["version"], r["op"])
            for r in ds.take_all()]
    return sorted(rows, key=lambda r: (_TYPE_ORDER[r[0]], r[1], r[2]))


# (meta1, meta2) mirrors the 4 CMake variants: full metadata, both
# only-version, first only-version, second only-version.
VARIANTS = [(True, True), (False, False), (False, True), (True, False)]


@pytest.mark.parametrize("m1,m2", VARIANTS)
def test_merge_changes_golden_merged(ray_session, m1, m2):
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import merge

    a, b = rd.from_arrow(_change1(m1)), rd.from_arrow(_change2(m2))
    out = merge([a, b], ["type", "id", "version"])
    assert _sorted_rows(out) == MERGED


@pytest.mark.parametrize("m1,m2", VARIANTS)
def test_merge_changes_golden_simplified(ray_session, m1, m2):
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import merge_changes_simplify

    a, b = rd.from_arrow(_change1(m1)), rd.from_arrow(_change2(m2))
    out = merge_changes_simplify([a, b], ["type", "id"])
    assert _sorted_rows(out) == SIMPLIFIED


def test_merge_changes_simplify_packed_max_variant(ray_session):
    """unique_versions packed-Max path gives the same golden output here
    (no duplicate (id, version) across change1/change2)."""
    import ray.data as rd

    from osmium_tool_ray.pipelines.merge import merge_changes_simplify

    a, b = rd.from_arrow(_change1()), rd.from_arrow(_change2())
    out = merge_changes_simplify([a, b], ["type", "id"],
                                 unique_versions=True)
    assert _sorted_rows(out) == SIMPLIFIED
