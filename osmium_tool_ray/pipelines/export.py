"""export — render rows to interchange formats and write them as text
sinks.

Reference formats (/root/reference/src/export/):
  * GeoJSON / GeoJSONSeq (export_format_json.cpp:215-282 —
    create_point/linestring/multipolygon; Seq = RFC 8142, one feature per
    line)
  * tab-text (export_format_text.cpp)
  * Postgres COPY with \\N nulls and tab escaping (export_format_pg.cpp:64-90)

Rendering is a vectorized map_batches (string building via pyarrow concat
kernels); the sink is write-parquet-of-lines or plain text files per
block — a streaming, shuffle-free pipeline like `osmium export`'s."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _json_escape(col: pa.Array) -> pa.Array:
    col = pc.replace_substring(col, pattern="\\", replacement="\\\\")
    col = pc.replace_substring(col, pattern='"', replacement='\\"')
    col = pc.replace_substring(col, pattern="\n", replacement="\\n")
    col = pc.replace_substring(col, pattern="\t", replacement="\\t")
    col = pc.replace_substring(col, pattern="\r", replacement="\\r")
    return col


def render_geojson_points(batch: pa.Table, id_col: str = "image_id",
                          lon_col: str = "lon", lat_col: str = "lat",
                          props: list[str] | None = None) -> pa.Table:
    """One GeoJSON Feature string per row (GeoJSONSeq line)."""
    n = batch.num_rows
    lon = batch[lon_col].cast(pa.string())
    lat = batch[lat_col].cast(pa.string())
    ids = _json_escape(batch[id_col].cast(pa.string()))
    parts = [pa.array(['{"type":"Feature","id":"'] * n), ids,
             pa.array(['","geometry":{"type":"Point","coordinates":['] * n),
             lon, pa.array([","] * n), lat,
             pa.array([']},"properties":{'] * n)]
    for i, p in enumerate(props or []):
        v = _json_escape(batch[p].cast(pa.string()))
        sep = "," if i else ""
        parts += [pa.array([f'{sep}"{p}":"'] * n), v, pa.array(['"'] * n)]
    parts.append(pa.array(["}}"] * n))
    line = pc.binary_join_element_wise(
        *[p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
          for p in parts], "")
    return pa.table({"line": line})


def _fmt_coord(arr) -> pa.Array:
    """Coordinate formatting for WKT text output: trailing-zero-free like
    the reference's text writer ('1 1', not '1.0 1.0')."""
    s = pc.cast(arr, pa.string())
    s = pc.replace_substring_regex(s, pattern=r"\.0$", replacement="")
    return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s


def render_text_points(batch: pa.Table, id_col: str = "image_id",
                       lon_col: str = "lon", lat_col: str = "lat",
                       tags_col: str | None = None) -> pa.Table:
    """The export `-f text` point form (export_format_text.cpp):
    `POINT(lon lat) @id=<id>[,k=v,...]` — one vectorized string build,
    tags (sorted k=v) appended when a tags column is present."""
    n = batch.num_rows
    parts = [pa.array(["POINT("] * n), _fmt_coord(batch[lon_col]),
             pa.array([" "] * n), _fmt_coord(batch[lat_col]),
             pa.array([") @id="] * n),
             batch[id_col].cast(pa.string()).combine_chunks()
             if isinstance(batch[id_col], pa.ChunkedArray)
             else batch[id_col].cast(pa.string())]
    if tags_col is not None and tags_col in batch.schema.names:
        from ..functions.matchers import flatten_tags

        keys, vals, row_idx = flatten_tags(batch[tags_col])
        karr = np.asarray(keys.to_pylist(), dtype=object)
        varr = np.asarray(vals.to_pylist(), dtype=object)
        suffix = np.full(n, "", dtype=object)
        # order tags (k=v) alphabetically per row without a Python row
        # loop: lexsort by (row, key), then join per key run
        if len(karr):
            order = np.lexsort((karr.astype(str), row_idx))
            r = row_idx[order]
            kv = np.char.add(np.char.add(karr[order].astype(str), "="),
                             varr[order].astype(str))
            starts = np.flatnonzero(
                np.concatenate([[True], r[1:] != r[:-1]]))
            joined = np.array(
                [",".join(kv[s:e]) for s, e in
                 zip(starts, np.concatenate([starts[1:], [len(kv)]]))],
                dtype=object)
            suffix[r[starts]] = np.char.add(
                ",", joined.astype(str)).astype(object)
        parts.append(pa.array(suffix, type=pa.string()))
    line = pc.binary_join_element_wise(
        *[p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
          for p in parts], "")
    return pa.table({"line": line})


def render_wkt_ways(members_with_locations, tags_by_way=None,
                    closed_as_polygon: bool = False):
    """The export `-f text` way form: `LINESTRING(x y,...) @id=<way>` (or
    `MULTIPOLYGON(((...)))` for closed rings when closed_as_polygon).
    Per-way assembly runs per hash(group_id)%buckets BUCKET (one sorted
    pass, ways as contiguous runs — per-partition pandas overhead, not
    per way; the group_by_key_bucket discipline); tags_by_way is an
    optional small broadcastable {way_id: 'k=v,...'} suffix map."""
    import ray

    from ..blocks import group_by_key_bucket

    tags_ref = ray.put(tags_by_way or {})

    def fold(df) -> "pd.DataFrame":
        import pandas as pd

        if df.empty:
            return pd.DataFrame({"line": []})
        tags_map = ray.get(tags_ref)
        df = df.sort_values(["group_id", "seq"], kind="stable")
        gid = df["group_id"].to_numpy()
        lon = df["lon"].to_numpy()
        lat = df["lat"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], gid[1:] != gid[:-1]]))
        ends = np.append(starts[1:], len(gid))

        def fmt(v):
            return f"{v:g}"

        lines = []
        for s, e in zip(starts, ends):
            coords = [(lo, la) for lo, la in zip(lon[s:e], lat[s:e])
                      if not (np.isnan(lo) or np.isnan(la))]
            if len(coords) < 2:
                continue
            wid = gid[s]
            pts = ",".join(f"{fmt(lo)} {fmt(la)}" for lo, la in coords)
            closed = coords[0] == coords[-1] and len(coords) >= 4
            tags = tags_map.get(wid, "")
            suffix = f" @id={wid}" + ("," + tags if tags else "")
            if closed and closed_as_polygon:
                from ..functions.geometry import is_ccw

                # outer rings CCW (geometry_util.cpp:22-34)
                ring_pts = coords if is_ccw(np.asarray(coords)) \
                    else coords[::-1]
                ring = ",".join(f"{fmt(lo)} {fmt(la)}"
                                for lo, la in ring_pts)
                lines.append(f"MULTIPOLYGON((({ring}))){suffix}")
            else:
                lines.append(f"LINESTRING({pts}){suffix}")
        return pd.DataFrame({"line": lines})

    return group_by_key_bucket(members_with_locations, "group_id",
                               fold, batch_format="pandas")


def add_type_id(batch: pa.Table, kind_col: str = "kind",
                id_col: str = "id", out_col: str = "feature_id") -> pa.Table:
    """-u type_id (man/osmium-export.md ATTRIBUTES): feature id 'n<id>'
    for nodes, 'w<id>' for way linestrings, and 'a<2*id>' / 'a<2*id+1>'
    for areas from ways / relations (output-uid.geojsonseq: relation 30
    -> a61). kind values: node / way / area_way / area_relation."""
    kind = batch[kind_col].to_numpy(zero_copy_only=False).astype(object)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    num = np.select(
        [kind == "area_way", kind == "area_relation"],
        [ids * 2, ids * 2 + 1], ids)
    prefix = np.select(
        [kind == "node", kind == "way"], ["n", "w"], "a")
    fid = np.char.add(prefix.astype(str), num.astype(str))
    return batch.append_column(out_col, pa.array(fid.astype(object),
                                                 type=pa.string()))


def add_counter_ids(ds, order_cols: list[str], start: int = 1,
                    out_col: str = "feature_id"):
    """-u counter: dense 1..N feature ids. The reference numbers features
    in stream order; Ray's execution is unordered, so the deterministic
    equivalent numbers by an explicit sort key — global sort, per-block
    offsets (only block ROW COUNTS touch the driver, same shape as
    idops.renumber_ranked), arange per block."""
    import ray
    import ray.data as rd

    from ..blocks import _remote_num_rows

    refs = ds.sort(order_cols).to_arrow_refs()
    counts = np.asarray(ray.get([_remote_num_rows.remote(r) for r in refs]),
                        dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
        if len(counts) else []

    @ray.remote(num_cpus=0)
    def rank_block(tbl: pa.Table, off0: int) -> pa.Table:
        ranks = np.arange(off0 + start, off0 + start + tbl.num_rows,
                          dtype=np.int64)
        return tbl.append_column(out_col, pa.array(ranks))

    ranked = [rank_block.remote(r, int(o)) for r, o in zip(refs, offsets)]
    if not ranked:
        return ds
    return rd.from_arrow_refs(ranked)


def render_pg_copy(batch: pa.Table, columns: list[str]) -> pa.Table:
    """Postgres COPY text rows: tab-separated, nulls as \\N, tab/newline/
    backslash escaped (export_format_pg.cpp escaping rules)."""
    cols = []
    for c in columns:
        col = batch[c].cast(pa.string())
        col = pc.replace_substring(col, pattern="\\", replacement="\\\\")
        col = pc.replace_substring(col, pattern="\t", replacement="\\t")
        col = pc.replace_substring(col, pattern="\n", replacement="\\n")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        cols.append(col.fill_null("\\N"))
    line = pc.binary_join_element_wise(*cols, "\t") if len(cols) > 1 else cols[0]
    return pa.table({"line": line})


def render_geojson_ways(members_with_locations, closed_as_polygon: bool = False):
    """Way geometry assembly: group located members by way, order by seq,
    emit LineString features (>=2 located points, matching the reference's
    way->linestring rule, export_handler.cpp:112-134) or Polygon when the
    ring closes and closed_as_polygon is set.

    Input: the add_locations_to_members output (group_id, seq, lon, lat).
    Per-way assembly runs per hash(group_id)%buckets bucket (ways as
    contiguous runs of one sorted pass — per-partition pandas overhead,
    not per way) — the Ray restatement of the NodeLocationsForWays +
    ExportHandler pass (command_export.cpp:620-632)."""
    import json

    import pandas as pd

    from ..blocks import group_by_key_bucket

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"line": []})
        df = df.sort_values(["group_id", "seq"], kind="stable")
        gid = df["group_id"].to_numpy()
        lon = df["lon"].to_numpy()
        lat = df["lat"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], gid[1:] != gid[:-1]]))
        ends = np.append(starts[1:], len(gid))
        lines = []
        for s, e in zip(starts, ends):
            coords = [[lo, la] for lo, la in zip(lon[s:e], lat[s:e])
                      if not (np.isnan(lo) or np.isnan(la))]
            if len(coords) < 2:
                continue
            closed = coords[0] == coords[-1] and len(coords) >= 4
            if closed and closed_as_polygon:
                geom = {"type": "Polygon", "coordinates": [coords]}
            else:
                geom = {"type": "LineString", "coordinates": coords}
            feat = {"type": "Feature", "id": str(gid[s]),
                    "geometry": geom, "properties": {}}
            lines.append(json.dumps(feat, separators=(",", ":")))
        return pd.DataFrame({"line": lines})

    return group_by_key_bucket(members_with_locations, "group_id",
                               fold, batch_format="pandas")


# per-worker-process cache for the broadcast fragment dict: a nested
# Python dict is RE-DESERIALIZED on every ray.get (unlike zero-copy
# numpy), and the assemble fns run once per relation group — without the
# cache the fetch cost is O(n_relations x total_fragment_bytes)
_FRAGS_CACHE: dict = {}


def _cached_frags(frags_ref):
    import ray

    key = frags_ref.hex()
    f = _FRAGS_CACHE.get(key)
    if f is None:
        f = ray.get(frags_ref)
        _FRAGS_CACHE.clear()
        _FRAGS_CACHE[key] = f
    return f


def _member_way_fragments(rel_members, way_members_with_locations):
    """Collect located geometry ONLY for ways that are members of the
    exported relations (the relation member lists are metadata-class; the
    located way stream is not): broadcast the wanted-way set, filter the
    member stream distributed, collect the narrow survivor projection,
    and return {way_id: [[lon, lat], ...]} plus its ray.put handle so the
    per-relation group tasks fetch it from the object store instead of
    re-serializing it into every task closure."""
    import ray

    from .extract import _collect_small, _isin, _np_str

    rm = _collect_small(rel_members, ["mtype", "ref"])
    wanted = np.unique(rm["ref"][rm["mtype"] == "way"]) \
        if len(rm["ref"]) else np.empty(0, dtype=object)
    wref = ray.put(wanted)

    def keep_wanted(batch: pa.Table) -> pa.Table:
        ids = ray.get(wref)
        return batch.filter(pa.array(_isin(_np_str(batch["group_id"]), ids)))

    wm = _collect_small(
        way_members_with_locations.map_batches(keep_wanted,
                                               batch_format="pyarrow"),
        ["group_id", "seq", "lon", "lat"])
    frags_of: dict[str, list] = {}
    order = np.lexsort((wm["seq"].astype(np.int64), wm["group_id"].astype(str)))
    for gid, lo, la in zip(wm["group_id"][order], wm["lon"][order],
                           wm["lat"][order]):
        frags_of.setdefault(gid, []).append([float(lo), float(la)])
    return frags_of, ray.put(frags_of)


def render_geojson_multipolygons(rel_members, way_members_with_locations):
    """Relation -> MultiPolygon assembly (simplified vs the full osmium
    area assembler: each member way must itself be a closed ring; outer
    rings normalized CCW, inner CW by their winding; no ring merging).
    rel_members: (group_id, seq, mtype='way', ref); way locations from
    add_locations_to_members."""
    import json

    import pandas as pd

    import ray

    from ..functions.geometry import ensure_closed, is_ccw

    from ..blocks import group_by_key_bucket

    _, frags_ref = _member_way_fragments(rel_members,
                                         way_members_with_locations)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"line": []})
        rings_of = _cached_frags(frags_ref)
        df = df[df["mtype"] == "way"] \
            .sort_values(["group_id", "seq"], kind="stable")
        if df.empty:
            return pd.DataFrame({"line": []})
        gid = df["group_id"].to_numpy()
        refs = df["ref"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], gid[1:] != gid[:-1]]))
        ends = np.append(starts[1:], len(gid))
        lines = []
        for s, e in zip(starts, ends):
            outers, inners = [], []
            for ref in refs[s:e]:
                pts = rings_of.get(ref)
                if not pts or len(pts) < 3:
                    continue
                ring = ensure_closed(np.asarray(pts, dtype=np.float64))
                (outers if is_ccw(ring) else inners).append(ring.tolist())
            if not outers:
                continue
            polys = [[o] + inners for o in outers[:1]] \
                + [[o] for o in outers[1:]]
            feat = {"type": "Feature", "id": str(gid[s]),
                    "geometry": {"type": "MultiPolygon",
                                 "coordinates": polys},
                    "properties": {}}
            lines.append(json.dumps(feat, separators=(",", ":")))
        return pd.DataFrame({"line": lines})

    return group_by_key_bucket(rel_members, "group_id", fold,
                               batch_format="pandas")


def render_geojson_areas(rel_members, way_members_with_locations):
    """Relation -> MultiPolygon through the FULL osmium-style area
    assembler: member ways may be OPEN fragments; fragments are stitched
    end-to-end into closed rings (functions.geometry.assemble_rings,
    matching the reference's exact fixed-point endpoint equality), rings
    are classified outer/inner by even-odd containment nesting, inners
    are attached to their containing outer, and orientations are
    normalized (outer CCW, inner CW — geometry_util.cpp:22-34).

    rel_members: (group_id, seq, mtype, ref); way geometry from
    add_locations_to_members output. The per-relation assembly runs per
    hash(group_id)%buckets bucket (relations as contiguous runs of one
    sorted pass); way fragments are keyed driver-side only
    for the member ways of the exported relations (narrow projection,
    filtered distributed; shipped to group tasks via the object store)."""
    import json

    import pandas as pd

    import ray

    from ..functions.geometry import (
        assemble_rings, normalize_ring, point_in_ring,
    )

    from ..blocks import group_by_key_bucket

    _, frags_ref = _member_way_fragments(rel_members,
                                         way_members_with_locations)

    def _one(gid, refs, frags_of):
        fragments = [np.asarray(frags_of[ref], dtype=np.float64)
                     for ref in refs
                     if len(frags_of.get(ref) or []) >= 2]
        if not fragments:
            return None
        rings, _leftover = assemble_rings(fragments)
        if not rings:
            return None
        # nesting depth via even-odd containment of a representative
        # vertex
        depth = np.zeros(len(rings), dtype=np.int64)
        for i, r in enumerate(rings):
            for j, other in enumerate(rings):
                if i != j and point_in_ring(r[0], other):
                    depth[i] += 1
        outers = [i for i in range(len(rings)) if depth[i] % 2 == 0]
        polys = []
        for oi in outers:
            shell = normalize_ring(rings[oi], outer=True)
            holes = [normalize_ring(rings[ii], outer=False)
                     for ii in range(len(rings))
                     if depth[ii] == depth[oi] + 1
                     and point_in_ring(rings[ii][0], rings[oi])]
            polys.append([shell.tolist()] + [h.tolist() for h in holes])
        feat = {"type": "Feature", "id": str(gid),
                "geometry": {"type": "MultiPolygon",
                             "coordinates": polys},
                "properties": {}}
        return json.dumps(feat, separators=(",", ":"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"line": []})
        frags_of = _cached_frags(frags_ref)
        df = df[df["mtype"] == "way"] \
            .sort_values(["group_id", "seq"], kind="stable")
        if df.empty:
            return pd.DataFrame({"line": []})
        gid = df["group_id"].to_numpy()
        refs = df["ref"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], gid[1:] != gid[:-1]]))
        ends = np.append(starts[1:], len(gid))
        lines = [ln for s, e in zip(starts, ends)
                 if (ln := _one(gid[s], refs[s:e], frags_of))
                 is not None]
        return pd.DataFrame({"line": lines})

    return group_by_key_bucket(rel_members, "group_id", fold,
                               batch_format="pandas")


def export_lines(ds, out_dir: str, renderer, **renderer_kwargs) -> str:
    """Render each batch to a `line` column and write one text file per
    block under out_dir (streaming, no shuffle)."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        tbl = renderer(batch, **renderer_kwargs)
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.txt")
        with open(name, "w") as f:
            for line in tbl["line"].to_pylist():
                f.write(line + "\n")
        return pa.table({"file": pa.array([name]),
                         "rows": pa.array([tbl.num_rows], type=pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    return out_dir if manifest is not None else out_dir
