"""Byte-exact OPL round trip against the reference's own `show -f opl`
golden output (/root/reference/test/show/output-opl.opl and the larger
formats fixture f1.osm.opl): parse -> render must reproduce the
reference's writer format field-for-field."""

from pathlib import Path

from osmium_tool_ray.sources.opl import (
    parse_opl_lines, render_opl_nodes, render_opl_relations, render_opl_ways,
)

SHOW_OPL = Path("/root/reference/test/show/output-opl.opl")


def _roundtrip(lines):
    parsed = parse_opl_lines(lines)
    out = render_opl_nodes(parsed["nodes"])["line"].to_pylist()
    out += render_opl_ways(parsed["groups"],
                           parsed["group_members"])["line"].to_pylist()
    out += render_opl_relations(parsed["groups"],
                                parsed["group_members"])["line"].to_pylist()
    return out


def test_show_opl_byte_roundtrip():
    lines = [l for l in SHOW_OPL.read_text().splitlines() if l.strip()]
    assert _roundtrip(lines) == lines


def test_f1_nodes_byte_roundtrip():
    """Node lines of the formats fixture — includes %-escapes, empty
    user, empty tag keys/values, high-precision coords."""
    src = Path("/root/reference/test/formats/f1.osm.opl").read_text()
    node_lines = [l for l in src.splitlines() if l.startswith("n")]
    parsed = parse_opl_lines(node_lines)
    got = render_opl_nodes(parsed["nodes"])["line"].to_pylist()
    assert got == node_lines


def test_f1_full_byte_roundtrip():
    """Every line of the formats fixture — nodes, ways AND the relation
    line with its `M<ref>@<role>` member list (%-escaped role,
    f1.osm.opl:7) — must round-trip byte-exactly."""
    src = Path("/root/reference/test/formats/f1.osm.opl").read_text()
    lines = [l for l in src.splitlines() if l.strip()]
    assert _roundtrip(lines) == lines
