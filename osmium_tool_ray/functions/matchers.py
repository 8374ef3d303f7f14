"""Tag/string expression matchers — vectorized port of the reference's
filter-expression semantics (/root/reference/src/util.cpp:115-208 and the
libosmium StringMatcher/TagMatcher contract):

  string matcher (get_string_matcher, util.cpp:142-176):
    "*"            -> always true
    "abc"          -> equal
    "a,b,c"        -> list (equal to any; members whitespace-stripped)
    "abc*"         -> prefix
    "*abc" / "*abc*" / "*a*" -> substring (leading '*' stripped, trailing
                      '*' stripped if present)
    leading/trailing spaces stripped first.

  tag matcher (get_tag_matcher, util.cpp:178-200):
    "key"          -> key matcher only (any value)
    "key=value"    -> key matches AND value matches
    "key!=value"   -> key matches AND value does NOT match (invert)

  filter expression (get_filter_expression, util.cpp:115-129):
    "n/expr" "w/expr" "nw/expr" "r/expr" ... -> entity-type prefix;
    bare "expr" or "/expr" -> applies to nodes+ways+relations.

  An object matches if ANY of its tags matches the tag matcher; a filter
  bank matches if any expression for that entity type matches
  (osmium::TagsFilter with default_result=false,
  command_tags_filter.cpp:46-59).

Matching is vectorized: tag lists are flattened to (row_index, key, value)
arrays once per batch and string predicates run as pyarrow.compute kernels
over the flat arrays.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class ExprError(ValueError):
    pass


def _strip_ws(s: str) -> str:
    return s.strip(" ")


@dataclass(frozen=True)
class StringMatcher:
    kind: str  # always | equal | list | prefix | substring
    arg: tuple = ()

    def __call__(self, arr: pa.Array) -> np.ndarray:
        """Vectorized match over a string array -> bool numpy array."""
        if self.kind == "always":
            return np.ones(len(arr), dtype=bool)
        if self.kind == "equal":
            out = pc.equal(arr, self.arg[0])
        elif self.kind == "list":
            out = pc.is_in(arr, value_set=pa.array(list(self.arg), type=pa.string()))
        elif self.kind == "prefix":
            out = pc.starts_with(arr, pattern=self.arg[0])
        elif self.kind == "substring":
            out = pc.match_substring(arr, pattern=self.arg[0])
        else:  # pragma: no cover
            raise ExprError(f"unknown matcher kind {self.kind}")
        return out.fill_null(False).to_numpy(zero_copy_only=False)

    def match_one(self, s: str) -> bool:
        return bool(self(pa.array([s], type=pa.string()))[0])


def get_string_matcher(s: str) -> StringMatcher:
    s = _strip_ws(s)
    if s == "*":
        return StringMatcher("always")
    if s == "" or (not s.endswith("*") and not s.startswith("*")):
        if "," not in s:
            return StringMatcher("equal", (s,))
        return StringMatcher("list", tuple(_strip_ws(p) for p in s.split(",")))
    if s.endswith("*") and not s.startswith("*"):
        return StringMatcher("prefix", (s[:-1],))
    t = s[1:] if s.startswith("*") else s
    if t.endswith("*"):
        t = t[:-1]
    return StringMatcher("substring", (t,))


@dataclass(frozen=True)
class TagMatcher:
    key: StringMatcher
    value: StringMatcher | None = None
    invert: bool = False

    def match_flat(self, keys: pa.Array, values: pa.Array) -> np.ndarray:
        m = self.key(keys)
        if self.value is not None:
            vm = self.value(values)
            m &= (vm != self.invert)
        return m


def get_tag_matcher(expression: str) -> TagMatcher:
    pos = expression.find("=")
    if pos == -1:
        return TagMatcher(get_string_matcher(expression))
    key, value = expression[:pos], expression[pos + 1:]
    invert = False
    if key.endswith("!"):
        key = key[:-1]
        invert = True
    return TagMatcher(get_string_matcher(key), get_string_matcher(value), invert)


_TYPE_LETTERS = {"n": "node", "w": "way", "r": "relation", "a": "area", "c": "changeset"}


def get_types(s: str) -> frozenset[str]:
    """Entity-type letters "nwr" -> {"node","way","relation"} (util.cpp get_types)."""
    out = set()
    for ch in s:
        if ch not in _TYPE_LETTERS:
            raise ExprError(f"Unknown object type '{ch}' (allowed are 'n', 'w', 'r', and 'a').")
        out.add(_TYPE_LETTERS[ch])
    return frozenset(out)


NWR = frozenset({"node", "way", "relation"})


def get_filter_expression(s: str) -> tuple[frozenset[str], str]:
    pos = s.find("/")
    if pos == -1:
        return NWR, s
    if pos == 0:
        return NWR, s[1:]
    return get_types(s[:pos]), s[pos + 1:]


@dataclass
class TagsFilter:
    """A bank of tag matchers per entity type, default result False; an
    object matches if any matcher for its type matches any of its tags
    (command_tags_filter.cpp:46-59, 128-136)."""

    rules: list[tuple[frozenset[str], TagMatcher]]

    @classmethod
    def from_expressions(cls, expressions: list[str]) -> "TagsFilter":
        rules = []
        for expr in expressions:
            expr = expr.strip()
            if not expr or expr.startswith("#"):
                continue
            types, tag_expr = get_filter_expression(expr)
            rules.append((types, get_tag_matcher(tag_expr)))
        if not rules:
            raise ExprError("Missing filter expressions")
        return cls(rules)

    def matchers_for(self, entity_type: str) -> list[TagMatcher]:
        return [m for types, m in self.rules if entity_type in types]

    def match_tag_lists(self, tags: pa.Array | pa.ChunkedArray, entity_type: str) -> np.ndarray:
        """tags: list<struct<key:string, value:string>> column -> per-row bool."""
        matchers = self.matchers_for(entity_type)
        n = len(tags)
        if not matchers:
            return np.zeros(n, dtype=bool)
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        flat_keys, flat_values, row_idx = flatten_tags(tags)
        if len(flat_keys) == 0:
            return np.zeros(n, dtype=bool)
        hit = np.zeros(len(flat_keys), dtype=bool)
        for m in matchers:
            hit |= m.match_flat(flat_keys, flat_values)
        out = np.zeros(n, dtype=bool)
        np.logical_or.at(out, row_idx[hit], True)
        return out


def flatten_tags(tags: pa.Array) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """list<struct<key,value>> -> (flat keys, flat values, parent row index)."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    la = tags
    offsets = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    start, stop = offsets[0], offsets[-1]
    counts = np.diff(offsets)
    row_idx = np.repeat(np.arange(len(la), dtype=np.int64), counts)
    flat = la.values.slice(start, stop - start)
    return flat.field("key"), flat.field("value"), row_idx


_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")


def caption_tags(captions: pa.Array) -> pa.Array:
    """Graft helper: parse 'k=v' tokens embedded in caption strings into a
    list<struct<key,value>> column (vectorized split on space + '=')."""
    split = pc.split_pattern(captions.cast(pa.string()), " ")
    flat = split.values if not isinstance(split, pa.ChunkedArray) else split.combine_chunks().values
    has_eq = pc.match_substring(flat, "=")
    kv = pc.split_pattern(flat, "=", max_splits=1)
    # build struct list back per row for tokens containing '='
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    row_idx = np.repeat(np.arange(len(split), dtype=np.int64), counts)
    mask = has_eq.to_numpy(zero_copy_only=False)
    row_sel = row_idx[mask]
    kv_sel = kv.filter(pa.array(mask))
    keys = pc.list_element(kv_sel, 0)
    vals = pc.list_element(kv_sel, 1)
    new_counts = np.bincount(row_sel, minlength=len(split)).astype(np.int32)
    new_offsets = np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
    structs = pa.StructArray.from_arrays([keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys,
                                          vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals],
                                         names=["key", "value"])
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), structs)
