"""GeoJSONSeq (RFC 8142) reader — the round-trip twin of the export
writer (pipelines/export.render_geojson_points, reference analogue
src/export/export_format_json.cpp): line-delimited Feature objects back
into typed (id, lon, lat, properties...) rows.

The reference has no GeoJSON *reader* (osmium only writes it); ours
closes the loop so an exported corpus re-enters the engine without an
external tool. Parsing is pyarrow.json's C++ block parser over the
batch's concatenated line buffer — never a per-row Python json.loads in
the hot path."""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.json as pajson

RS = "\x1e"  # RFC 8142 record separator, tolerated and stripped


def parse_geojsonseq_lines(lines, props: list[str] | None = None) -> pa.Table:
    """One batch of Feature line strings -> typed table. Extracts the
    Feature id, Point coordinates (lon, lat) and the requested
    `properties` keys (all of them when props is None)."""
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    txt = [s.lstrip(RS) for s in lines.to_pylist()]
    empty_props = props or []
    if not txt:
        cols = {"feature_id": pa.array([], type=pa.string()),
                "lon": pa.array([], type=pa.float64()),
                "lat": pa.array([], type=pa.float64())}
        for p in empty_props:
            cols[p] = pa.array([], type=pa.string())
        return pa.table(cols)
    tbl = pajson.read_json(io.BytesIO("\n".join(txt).encode()))
    import pyarrow.compute as pc

    geom = tbl.column("geometry").combine_chunks()
    coords = geom.field("coordinates")
    if not pc.all(pc.equal(pc.list_value_length(coords), 2)).as_py():
        raise ValueError("read_geojsonseq handles Point features only")
    flat = pc.list_flatten(coords).to_numpy(zero_copy_only=False)
    lon, lat = flat[0::2], flat[1::2]
    prop_struct = tbl.column("properties").combine_chunks()
    names = props if props is not None else \
        [f.name for f in prop_struct.type]
    cols = {"feature_id": tbl.column("id").cast(pa.string()),
            "lon": pa.array(lon.astype(np.float64)),
            "lat": pa.array(lat.astype(np.float64))}
    for p in names:
        cols[p] = prop_struct.field(p)
    return pa.table(cols)


def read_geojsonseq(lines_ds, line_col: str = "line",
                    props: list[str] | None = None):
    """Dataset of Feature line strings (an export output or
    ray.data.read_text over .geojsonseq files) -> typed Dataset."""
    return lines_ds.map_batches(
        lambda b: parse_geojsonseq_lines(b[line_col], props=props),
        batch_format="pyarrow")
