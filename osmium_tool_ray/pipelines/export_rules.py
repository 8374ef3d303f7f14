"""Export linear/area tag rulesets — the config surface that decides
whether a (closed) way becomes a LineString, an Area, or both.

Reference semantics:

  * ruleset parse (/root/reference/src/command_export.cpp:76-121
    parse_tags_ruleset): missing/null -> OTHER; true -> ANY; false ->
    NONE; [] -> ANY (with a warning); [list of "key" / "key=value"] ->
    LIST. When BOTH linear_tags and area_tags are missing, both become
    ANY (the :81-82 comment).
  * rule evaluation (/root/reference/src/export/export_handler.cpp:42-58
    check_conditions + ruleset.hpp:46-59 init_filter):
      - an explicit `area` tag wins: area=no -> linear only, area=yes ->
        area only (other values fall through to the rulesets);
      - is_linear asks the linear ruleset, is_area the area ruleset;
      - OTHER means "everything the *other* ruleset's list does not
        match" (match_none_of); ANY matches any row WITH at least one
        tag; NONE matches nothing; LIST matches rows having any tag in
        the list.
  * way dispatch (export_handler.cpp:112-134 + the untagged-feature
    drop): open ways are always linestrings; closed ways are
    linestrings iff untagged-with-keep_untagged or is_linear(tags);
    areas are built only from TAGGED closed ways passing is_area
    (untagged closed ways never produce areas — way-all-n.txt id=40).

Scale shape: the dispatch is a stateless vectorized map_batches —
flatten_tags + searchsorted set membership per batch, no Python row
loop, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.matchers import flatten_tags
from .extract import _isin, _np_str

OTHER, ANY, NONE, LIST = "other", "any", "none", "list"

_MISSING = object()


class Ruleset:
    """One of linear_tags / area_tags (ruleset.hpp:18-61)."""

    def __init__(self, rule_type: str, rules: list[str] | None = None):
        self.rule_type = rule_type
        self.rules = [r for r in (rules or []) if r]
        # split "key" vs "key=value" rules once (initialize_tags_filter)
        self._keys = np.asarray(
            sorted({r for r in self.rules if "=" not in r}), dtype=object)
        self._pairs = np.asarray(
            sorted({r for r in self.rules if "=" in r}), dtype=object)

    @classmethod
    def parse(cls, value=_MISSING) -> "Ruleset":
        """parse_tags_ruleset (command_export.cpp:76-121)."""
        if value is _MISSING or value is None:
            return cls(OTHER)
        if isinstance(value, bool):
            return cls(ANY if value else NONE)
        if not isinstance(value, list):
            raise ValueError(
                "'linear_tags'/'area_tags' must be false, true, null, "
                "or an array.")
        if not value:
            # reference warns and treats [] as ANY (:100-105)
            return cls(ANY)
        if not all(isinstance(v, str) for v in value):
            raise ValueError("Array elements must be strings.")
        return cls(LIST, list(value))

    def list_match(self, keys, vals, row_idx, nrows: int) -> np.ndarray:
        """match_any_of against this ruleset's LIST filter (empty filter
        for OTHER/NONE matches nothing; ANY's default-true filter matches
        any present tag)."""
        hit = np.zeros(nrows, dtype=bool)
        if self.rule_type == ANY:
            np.logical_or.at(hit, row_idx, True)
            return hit
        if self.rule_type != LIST:
            return hit
        k = _np_str(keys)
        tag_hit = _isin(k, self._keys)
        if len(self._pairs):
            kv = np.char.add(np.char.add(k.astype(str), "="),
                             _np_str(vals).astype(str))
            tag_hit |= _isin(kv.astype(object), self._pairs)
        np.logical_or.at(hit, row_idx, tag_hit)
        return hit


def parse_rulesets(config: dict) -> tuple[Ruleset, Ruleset]:
    """linear_tags + area_tags from an export config JSON object,
    including the both-missing -> both-ANY promotion."""
    lin_raw = config.get("linear_tags", _MISSING)
    area_raw = config.get("area_tags", _MISSING)
    if lin_raw is _MISSING and area_raw is _MISSING:
        return Ruleset(ANY), Ruleset(ANY)
    return Ruleset.parse(lin_raw), Ruleset.parse(area_raw)


def _check_conditions(r1: Ruleset, r2: Ruleset, is_no: bool,
                      area_no, area_yes, m1, m2) -> np.ndarray:
    """Vectorized check_conditions (export_handler.cpp:42-58). m1/m2 are
    the precomputed list_match masks of r1/r2."""
    if r1.rule_type == OTHER:
        base = ~m2
    else:
        base = m1
    return np.where(area_no, is_no, np.where(area_yes, not is_no, base))


def export_way_features(ways, linear: Ruleset, area: Ruleset,
                        keep_untagged: bool = False,
                        tags_col: str = "tags",
                        closed_col: str = "closed"):
    """Dispatch a ways Dataset into output features: each row becomes 0,
    1 or 2 rows with a `geom` column ("linestring" / "area").

    Rules (export_handler.cpp:112-157 + the untagged drop):
      open    -> linestring, iff tagged or keep_untagged
      closed  -> linestring iff (untagged and keep_untagged) or
                 (tagged and is_linear); area iff tagged and is_area
    """
    def dispatch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("geom", pa.array([], type=pa.string()))
        keys, vals, row_idx = flatten_tags(batch[tags_col])
        k = _np_str(keys)
        v = _np_str(vals)
        n_tags = np.zeros(n, dtype=np.int64)
        np.add.at(n_tags, row_idx, 1)
        tagged = n_tags > 0
        is_area_tag = k == "area"
        area_no = np.zeros(n, dtype=bool)
        area_yes = np.zeros(n, dtype=bool)
        np.logical_or.at(area_no, row_idx, is_area_tag & (v == "no"))
        np.logical_or.at(area_yes, row_idx, is_area_tag & (v == "yes"))
        m_lin = linear.list_match(keys, vals, row_idx, n)
        m_area = area.list_match(keys, vals, row_idx, n)
        is_lin = _check_conditions(linear, area, True,
                                   area_no, area_yes, m_lin, m_area)
        is_ar = _check_conditions(area, linear, False,
                                  area_no, area_yes, m_area, m_lin)
        closed = batch[closed_col].to_numpy(zero_copy_only=False).astype(bool)
        emit_line = np.where(
            closed,
            (~tagged & keep_untagged) | (tagged & is_lin),
            tagged | keep_untagged)
        emit_area = closed & tagged & is_ar
        lines = batch.filter(pa.array(emit_line)).append_column(
            "geom", pa.array(["linestring"] * int(emit_line.sum())))
        areas = batch.filter(pa.array(emit_area)).append_column(
            "geom", pa.array(["area"] * int(emit_area.sum())))
        return pa.concat_tables([lines, areas])

    return ways.map_batches(dispatch, batch_format="pyarrow")
