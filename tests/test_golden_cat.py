"""Golden parity with the reference cat suite
(/root/reference/test/cat/CMakeLists.txt): input1 (n1-n3) + input2
(n4-n6) -> all six objects in either input order (output-cat12/cat21
differ only in stream order; our engine's ordering contract
re-establishes order at the sink, SURVEY.md §2.8), plus --object-type
selection and --clean attribute scrub."""

import pyarrow as pa

from osmium_tool_ray.pipelines.cat import cat


def _in(ids, kinds=None):
    return pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "kind": pa.array(kinds or ["node"] * len(ids)),
        "uid": pa.array([7] * len(ids), type=pa.int64()),
    })


def _sorted_ids(ds):
    return sorted(r["id"] for r in ds.take_all())


def test_cat_both_orders_same_sorted_output(ray_session):
    import ray.data as rd

    a, b = rd.from_arrow(_in([1, 2, 3])), rd.from_arrow(_in([4, 5, 6]))
    assert _sorted_ids(cat([a, b])) == [1, 2, 3, 4, 5, 6]   # cat12
    assert _sorted_ids(cat([b, a])) == [1, 2, 3, 4, 5, 6]   # cat21


def test_cat_object_type_select(ray_session):
    """--object-type node keeps only nodes (command_cat.cpp:156-235)."""
    import ray.data as rd

    mixed = rd.from_arrow(_in([1, 2, 3, 4],
                              ["node", "way", "node", "relation"]))
    assert _sorted_ids(cat([mixed], object_types=["node"])) == [1, 3]
    assert _sorted_ids(cat([mixed], object_types=["way", "relation"])) \
        == [2, 4]


def test_cat_clean_uid(ray_session):
    """--clean uid zeroes the attribute on every row
    (option_clean.cpp:53-71)."""
    import ray.data as rd

    out = cat([rd.from_arrow(_in([1, 2]))], clean=["uid"])
    assert {r["uid"] for r in out.take_all()} == {0}
