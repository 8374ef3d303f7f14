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
