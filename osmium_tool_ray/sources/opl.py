"""OPL (Object Per Line) reader/writer — the reference's line-oriented text
format (/root/reference/man/osmium-file-formats.md, sample
/root/reference/test/formats/f1.osm.opl).

Grammar per line (space-separated fields, first char of each field is the
field code): `n|w|r<ID>` then `v<version>` `dV|dD` (visible/deleted)
`c<changeset>` `t<ISO timestamp>` `i<uid>` `u<user>` `T<k=v,k=v,...>`
and per type: nodes `x<lon> y<lat>`, ways `N n<id>,n<id>,...`, relations
`M<t><ref>@<role>,...`. Strings use %-escaping (`%20%` = codepoint 0x20).

Reader: `ray.data.read_text` -> vectorized-ish per-batch parse into the
engine's nodes/groups/group_members tables. The parse is a per-line Python
loop (text formats always are — the reference's OPL parser is too); it runs
distributed across read blocks."""

from __future__ import annotations

import pyarrow as pa

from ..schema import TAGS_TYPE


def _unescape(s: str) -> str:
    if "%" not in s:
        return s
    out = []
    i = 0
    while i < len(s):
        if s[i] == "%":
            j = s.find("%", i + 1)
            if j == -1:
                out.append(s[i])
                i += 1
                continue
            out.append(chr(int(s[i + 1:j], 16)))
            i = j + 1
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _escape(s: str) -> str:
    special = " ,=@%\n\t"
    if not any(c in special for c in s):
        return s
    return "".join(f"%{ord(c):x}%" if c in special else c for c in s)


def _parse_tags(field: str) -> list[dict]:
    if not field:
        return []
    tags = []
    for kv in field.split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            tags.append({"key": _unescape(k), "value": _unescape(v)})
    return tags


def parse_opl_lines(lines) -> dict[str, pa.Table]:
    """-> {"nodes": ..., "groups": ..., "group_members": ...} tables.
    Node ids become `n<id>`, ways `w<id>`, relations `r<id>` (the engine's
    string-id convention)."""
    nodes = {"image_id": [], "version": [], "visible": [], "changeset": [],
             "ts": [], "uid": [], "user": [], "tags": [], "lon": [], "lat": []}
    groups = {"group_id": [], "kind": [], "version": [], "tags": [],
              "visible": [], "changeset": [], "ts": [], "uid": [],
              "user": []}
    members = {"group_id": [], "seq": [], "mtype": [], "ref": [], "role": []}
    mt = {"n": "node", "w": "way", "r": "relation"}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        fields = line.split(" ")
        head = fields[0]
        kind = head[0]
        oid = head
        attrs = {"v": "0", "d": "V", "c": "0", "t": "", "i": "0", "u": "",
                 "T": "", "x": "", "y": "", "N": "", "M": ""}
        for f in fields[1:]:
            if f:
                attrs[f[0]] = f[1:]
        if kind == "n":
            nodes["image_id"].append(oid)
            nodes["version"].append(int(attrs["v"] or 0))
            nodes["visible"].append(attrs["d"] != "D")
            nodes["changeset"].append(int(attrs["c"] or 0))
            nodes["ts"].append(attrs["t"] or None)
            nodes["uid"].append(int(attrs["i"] or 0))
            nodes["user"].append(_unescape(attrs["u"]))
            nodes["tags"].append(_parse_tags(attrs["T"]))
            nodes["lon"].append(float(attrs["x"]) if attrs["x"] else None)
            nodes["lat"].append(float(attrs["y"]) if attrs["y"] else None)
        elif kind in ("w", "r"):
            groups["group_id"].append(oid)
            groups["kind"].append(mt[kind])
            groups["version"].append(int(attrs["v"] or 0))
            groups["tags"].append(_parse_tags(attrs["T"]))
            groups["visible"].append(attrs["d"] != "D")
            groups["changeset"].append(int(attrs["c"] or 0))
            groups["ts"].append(attrs["t"] or None)
            groups["uid"].append(int(attrs["i"] or 0))
            groups["user"].append(_unescape(attrs["u"]))
            if kind == "w" and attrs["N"]:
                for seq, ref in enumerate(attrs["N"].split(",")):
                    members["group_id"].append(oid)
                    members["seq"].append(seq)
                    members["mtype"].append("node")
                    members["ref"].append(ref)
                    members["role"].append("")
            elif kind == "r" and attrs["M"]:
                for seq, m in enumerate(attrs["M"].split(",")):
                    ref, _, role = m.partition("@")
                    members["group_id"].append(oid)
                    members["seq"].append(seq)
                    members["mtype"].append(mt.get(ref[0], "node"))
                    members["ref"].append(ref)
                    members["role"].append(_unescape(role))
        else:
            raise ValueError(f"Unknown OPL object type: '{line[:20]}'")
    ts = [t.rstrip("Z").replace("T", " ") if t else None for t in nodes["ts"]]
    return {
        "nodes": pa.table({
            "image_id": pa.array(nodes["image_id"], type=pa.string()),
            "version": pa.array(nodes["version"], type=pa.int32()),
            "visible": pa.array(nodes["visible"]),
            "changeset": pa.array(nodes["changeset"], type=pa.int64()),
            "ts": pa.array(ts, type=pa.string()).cast(pa.timestamp("s")),
            "uid": pa.array(nodes["uid"], type=pa.int32()),
            "user": pa.array(nodes["user"], type=pa.string()),
            "tags": pa.array(nodes["tags"], type=TAGS_TYPE),
            "lon": pa.array(nodes["lon"], type=pa.float64()),
            "lat": pa.array(nodes["lat"], type=pa.float64()),
        }),
        "groups": pa.table({
            "group_id": pa.array(groups["group_id"], type=pa.string()),
            "kind": pa.array(groups["kind"], type=pa.string()),
            "version": pa.array(groups["version"], type=pa.int32()),
            "tags": pa.array(groups["tags"], type=TAGS_TYPE),
            "visible": pa.array(groups["visible"]),
            "changeset": pa.array(groups["changeset"], type=pa.int64()),
            "ts": pa.array(
                [t.rstrip("Z").replace("T", " ") if t else None
                 for t in groups["ts"]],
                type=pa.string()).cast(pa.timestamp("s")),
            "uid": pa.array(groups["uid"], type=pa.int32()),
            "user": pa.array(groups["user"], type=pa.string()),
        }),
        "group_members": pa.table({
            "group_id": pa.array(members["group_id"], type=pa.string()),
            "seq": pa.array(members["seq"], type=pa.int32()),
            "mtype": pa.array(members["mtype"], type=pa.string()),
            "ref": pa.array(members["ref"], type=pa.string()),
            "role": pa.array(members["role"], type=pa.string()),
        }),
    }


def read_opl(path: str):
    """Distributed OPL read -> dict of three Ray Datasets. Each text block
    parses independently (OPL is line-delimited, no cross-line state)."""
    import ray.data as rd

    text = rd.read_text(path)
    out = {}
    for key in ("nodes", "groups", "group_members"):
        def parse(batch, key=key):
            lines = batch["text"] if "text" in batch.column_names else batch[0]
            return parse_opl_lines([str(x) for x in lines.to_pylist()])[key]

        out[key] = text.map_batches(parse, batch_format="pyarrow")
    return out


def _coord(v: float) -> str:
    """7-decimal fixed point, trailing zeros trimmed — the reference's
    OPL coordinate rendering (libosmium location precision is 1e-7;
    f1.osm.opl keeps y2.034523 exactly, %g would truncate it)."""
    return f"{v:.7f}".rstrip("0").rstrip(".")


def render_opl_nodes(batch: pa.Table) -> pa.Table:
    """nodes table -> OPL lines (writer direction)."""
    lines = []
    tags_col = batch["tags"].to_pylist() if "tags" in batch.schema.names \
        else [[]] * batch.num_rows
    for i in range(batch.num_rows):
        r = {c: batch[c][i].as_py() for c in batch.schema.names if c != "tags"}
        tags = tags_col[i] or []
        tstr = ",".join(f"{_escape(t['key'])}={_escape(t['value'])}" for t in tags)
        ts = r.get("ts")
        tss = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else ""
        vis = "V" if r.get("visible", True) else "D"
        lines.append(
            f"{r['image_id']} v{r.get('version', 0)} d{vis} c{r.get('changeset', 0)} "
            f"t{tss} i{r.get('uid', 0)} u{_escape(r.get('user', '') or '')} T{tstr} "
            f"x{_coord(r['lon'])} y{_coord(r['lat'])}")
    return pa.table({"line": pa.array(lines, type=pa.string())})


def render_opl_ways(groups: pa.Table, members: pa.Table) -> pa.Table:
    """way rows of a groups table -> OPL `w... N<refs>` lines (writer
    direction, matching the reference's OPL output field order —
    /root/reference/test/show/output-opl.opl is the golden form)."""
    tags_col = groups["tags"].to_pylist() if "tags" in groups.schema.names \
        else [[]] * groups.num_rows
    m_gid = members["group_id"].to_pylist()
    m_seq = members["seq"].to_pylist() if "seq" in members.schema.names \
        else list(range(len(m_gid)))
    m_ref = members["ref"].to_pylist()
    refs_of: dict = {}
    for g, s, r in sorted(zip(m_gid, m_seq, m_ref)):
        refs_of.setdefault(g, []).append(r)
    lines = []
    for i in range(groups.num_rows):
        r = {c: groups[c][i].as_py() for c in groups.schema.names
             if c != "tags"}
        if r.get("kind") != "way":
            continue
        tags = tags_col[i] or []
        tstr = ",".join(f"{_escape(t['key'])}={_escape(t['value'])}"
                        for t in tags)
        ts = r.get("ts")
        tss = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else ""
        vis = "V" if r.get("visible", True) else "D"
        refs = ",".join(refs_of.get(r["group_id"], []))
        lines.append(
            f"{r['group_id']} v{r.get('version', 0)} d{vis} "
            f"c{r.get('changeset', 0)} t{tss} i{r.get('uid', 0)} "
            f"u{_escape(r.get('user', '') or '')} T{tstr} N{refs}")
    return pa.table({"line": pa.array(lines, type=pa.string())})


def render_opl_relations(groups: pa.Table, members: pa.Table) -> pa.Table:
    """relation rows of a groups table -> OPL `r... M<ref>@<role>,...`
    lines. Member refs carry their type prefix (n/w/r) already — the
    engine's string-id convention matches the reference's member
    rendering (`r30 ... Mn12@,w20@some%20%way`,
    /root/reference/test/formats/f1.osm.opl:7); roles are %-escaped."""
    tags_col = groups["tags"].to_pylist() if "tags" in groups.schema.names \
        else [[]] * groups.num_rows
    m_gid = members["group_id"].to_pylist()
    m_seq = members["seq"].to_pylist() if "seq" in members.schema.names \
        else list(range(len(m_gid)))
    m_ref = members["ref"].to_pylist()
    m_role = members["role"].to_pylist() if "role" in members.schema.names \
        else [""] * len(m_gid)
    mems_of: dict = {}
    for g, s, r, ro in sorted(zip(m_gid, m_seq, m_ref, m_role)):
        mems_of.setdefault(g, []).append(f"{r}@{_escape(ro or '')}")
    lines = []
    for i in range(groups.num_rows):
        r = {c: groups[c][i].as_py() for c in groups.schema.names
             if c != "tags"}
        if r.get("kind") != "relation":
            continue
        tags = tags_col[i] or []
        tstr = ",".join(f"{_escape(t['key'])}={_escape(t['value'])}"
                        for t in tags)
        ts = r.get("ts")
        tss = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else ""
        vis = "V" if r.get("visible", True) else "D"
        mems = ",".join(mems_of.get(r["group_id"], []))
        lines.append(
            f"{r['group_id']} v{r.get('version', 0)} d{vis} "
            f"c{r.get('changeset', 0)} t{tss} i{r.get('uid', 0)} "
            f"u{_escape(r.get('user', '') or '')} T{tstr} M{mems}")
    return pa.table({"line": pa.array(lines, type=pa.string())})
