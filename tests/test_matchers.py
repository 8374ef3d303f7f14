import numpy as np
import pyarrow as pa
import pytest

from osmium_tool_ray.functions.matchers import (
    ExprError, TagsFilter, caption_tags, flatten_tags, get_filter_expression,
    get_string_matcher, get_tag_matcher, get_types,
)


def test_string_matcher_kinds():
    # util.cpp:142-176 semantics
    assert get_string_matcher("*").kind == "always"
    assert get_string_matcher("abc").kind == "equal"
    assert get_string_matcher("a,b,c").kind == "list"
    assert get_string_matcher(" a , b ").arg == ("a", "b")
    assert get_string_matcher("abc*").kind == "prefix"
    assert get_string_matcher("abc*").arg == ("abc",)
    assert get_string_matcher("*abc").kind == "substring"
    assert get_string_matcher("*abc*").arg == ("abc",)
    assert get_string_matcher("*abc").arg == ("abc",)
    assert get_string_matcher("").kind == "equal"


def test_string_matcher_eval():
    arr = pa.array(["highway", "highwayman", "way", None])
    assert get_string_matcher("highway")(arr).tolist() == [True, False, False, False]
    assert get_string_matcher("high*")(arr).tolist() == [True, True, False, False]
    assert get_string_matcher("*way*")(arr).tolist() == [True, True, True, False]
    assert get_string_matcher("highway,way")(arr).tolist() == [True, False, True, False]
    assert get_string_matcher("*")(arr).tolist() == [True, True, True, True]


def test_tag_matcher_invert():
    m = get_tag_matcher("highway!=primary")
    keys = pa.array(["highway", "highway", "amenity"])
    vals = pa.array(["primary", "residential", "primary"])
    assert m.match_flat(keys, vals).tolist() == [False, True, False]


def test_filter_expression_types():
    assert get_filter_expression("n/amenity") == (frozenset({"node"}), "amenity")
    assert get_filter_expression("nw/highway")[0] == frozenset({"node", "way"})
    assert get_filter_expression("/x") == (frozenset({"node", "way", "relation"}), "x")
    assert get_filter_expression("amenity=bar")[1] == "amenity=bar"
    with pytest.raises(ExprError):
        get_types("z")


def _tags(rows):
    return pa.array(rows, type=pa.list_(pa.struct([("key", pa.string()),
                                                   ("value", pa.string())])))


def test_tags_filter_match():
    tags = _tags([
        [{"key": "highway", "value": "primary"}],
        [{"key": "note", "value": "test"}, {"key": "highway", "value": "residential"}],
        [],
        [{"key": "amenity", "value": "post_box"}],
    ])
    f = TagsFilter.from_expressions(["w/highway"])
    assert f.match_tag_lists(tags, "way").tolist() == [True, True, False, False]
    assert f.match_tag_lists(tags, "node").tolist() == [False, False, False, False]
    f2 = TagsFilter.from_expressions(["highway=primary", "amenity"])
    assert f2.match_tag_lists(tags, "node").tolist() == [True, False, False, True]


def test_flatten_tags_sliced():
    tags = _tags([[{"key": "a", "value": "1"}], [], [{"key": "b", "value": "2"},
                                                    {"key": "c", "value": "3"}]])
    k, v, idx = flatten_tags(tags)
    assert k.to_pylist() == ["a", "b", "c"]
    assert idx.tolist() == [0, 2, 2]


def test_caption_tags():
    caps = pa.array(["caption 1 highway=primary", "plain words", "a=1 b=2"])
    tags = caption_tags(caps)
    assert tags.to_pylist()[0] == [{"key": "highway", "value": "primary"}]
    assert tags.to_pylist()[1] == []
    assert [t["key"] for t in tags.to_pylist()[2]] == ["a", "b"]


def test_reference_util_unit_matrix():
    """The reference's ENTIRE util unit-test matrix
    (test/util/test_unit.cpp:58-129) ported case-for-case: string-matcher
    classification incl. mid-star literals and comma handling after a
    leading star, the full tag-matcher truth table, object-type parsing
    with error cases, and filter-expression splitting."""
    cases = [
        ("foo", "equal", ("foo",)), ("", "equal", ("",)),
        ("foo*", "prefix", ("foo",)), (" foo* ", "prefix", ("foo",)),
        ("*foo", "substring", ("foo",)), ("*foo*", "substring", ("foo",)),
        (" *foo* ", "substring", ("foo",)), ("*", "always", None),
        (" * ", "always", None), ("f*oo", "equal", ("f*oo",)),
        ("foo,bar", "list", ("foo", "bar")),
        ("foo,bar*,baz", "list", ("foo", "bar*", "baz")),
        ("*foo,bar", "substring", ("foo,bar",)),
        ("foo ", "equal", ("foo",)), (" foo", "equal", ("foo",)),
        ("  foo ", "equal", ("foo",)),
        ("foo, bar, baz", "list", ("foo", "bar", "baz")),
        ("  foo, bar   ,baz   ", "list", ("foo", "bar", "baz")),
    ]
    for s, kind, arg in cases:
        m = get_string_matcher(s)
        assert m.kind == kind, (s, m.kind, kind)
        if arg is not None and m.kind != "always":
            assert tuple(m.arg) == arg, (s, m.arg, arg)

    def tm(expr, k, v):
        return bool(get_tag_matcher(expr).match_flat(
            pa.array([k]), pa.array([v]))[0])

    assert tm("foo", "foo", "bar")
    assert tm("foo=bar", "foo", "bar")
    assert tm("foo!=bar", "foo", "baz")
    assert not tm("foo!=bar", "foo", "bar")
    assert tm("highway=primary,secondary", "highway", "primary")
    assert tm("highway=primary,secondary", "highway", "secondary")
    assert not tm("highway=primary,secondary", "highway", "residential")
    assert tm("landuse,natural", "landuse", "forest")
    assert tm("landuse,natural", "natural", "wood")
    assert not tm("landuse,natural", "highway", "motorway")
    assert tm("addr:*", "addr:city", "Berlin")
    assert not tm("addr:*", "addr", "Berlin")

    assert get_types("") == frozenset()
    assert get_types("n") == frozenset({"node"})
    assert get_types("rw") == frozenset({"way", "relation"})
    for bad in ("x", "nwx"):
        with pytest.raises(ExprError):
            get_types(bad)

    nwr = frozenset({"node", "way", "relation"})
    assert get_filter_expression("highway") == (nwr, "highway")
    assert get_filter_expression("/highway") == (nwr, "highway")
    assert get_filter_expression("n/highway") == (frozenset({"node"}),
                                                  "highway")
    assert get_filter_expression("n/highway/foo") == (frozenset({"node"}),
                                                      "highway/foo")
    with pytest.raises(ExprError):
        get_filter_expression("highway/foo")
