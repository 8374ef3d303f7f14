"""Deterministic synthetic geo-tagged image corpus.

The sandbox testdata is TPC-H-shaped; the engine's input per
BASELINE.json input_hint is a Lance/Arrow table of image+caption rows.
This module derives that table deterministically, either

  * from the `events` parquet table of a testdata sf directory (each
    event_id becomes one image row) — every derived column is exact
    integer/string arithmetic so the DuckDB oracle can reproduce it
    bit-for-bit (see IMAGES_SQL_CTE), or
  * from a plain index range (bench-scale corpora of arbitrary size).

Columns (input_hint shape + lon/lat):
  image_id = 'img' + zero-padded id
  bytes    = fake-codec-encoded deterministic pixels (functions/imagecodec)
  w = h = 16, fmt = png for even ids / jpeg for odd ids
  caption  = 'caption <id> <event_type>'   (range corpus: 'caption <id> e<id%7>')
  phash    = (id * 2654435761) % 2^40
  lon      = ((id * 7919) % 36000) / 100 - 180     in [-180, 179.99]
  lat      = ((id * 104729) % 17000) / 100 - 85    in [-85, 84.99]
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.imagecodec import encode_batch, gen_pixels
from .readers import read_parquet_clean

PHASH_MOD = 1 << 40


def _derive_columns(ids: np.ndarray, event_type: np.ndarray | None,
                    with_bytes: bool, columns=None) -> pa.Table:
    """columns=None derives everything; a list derives ONLY those columns
    (derive-side projection pushdown — string building and pixel encoding
    are the expensive parts, so a lon/lat-only consumer skips them)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    want = None if columns is None else set(columns)

    def _w(name):
        return want is None or name in want

    cols = {}
    if _w("image_id"):
        cols["image_id"] = pa.array(
            np.char.add("img", np.char.zfill(ids.astype(str), 10)),
            type=pa.string())
    fmt = np.where(ids % 2 == 0, "png", "jpeg") \
        if (with_bytes or _w("fmt")) else None
    if with_bytes and _w("bytes"):
        cols["bytes"] = encode_batch(gen_pixels(ids), fmt)
    if _w("w"):
        cols["w"] = pa.array(np.full(n, 16, dtype=np.int32))
    if _w("h"):
        cols["h"] = pa.array(np.full(n, 16, dtype=np.int32))
    if _w("fmt"):
        cols["fmt"] = pa.array(fmt, type=pa.string())
    if _w("caption"):
        if event_type is None:
            event_type = np.char.add("e", (ids % 7).astype(str))
        cols["caption"] = pa.array(
            np.char.add(np.char.add(np.char.add("caption ", ids.astype(str)),
                                    " "), event_type.astype(str)),
            type=pa.string())
    if _w("phash"):
        cols["phash"] = pa.array((ids * 2654435761) % PHASH_MOD,
                                 type=pa.int64())
    if _w("lon"):
        cols["lon"] = pa.array(((ids * 7919) % 36000) / 100.0 - 180.0,
                               type=pa.float64())
    if _w("lat"):
        cols["lat"] = pa.array(((ids * 104729) % 17000) / 100.0 - 85.0,
                               type=pa.float64())
    return pa.table(cols)


def images_from_events_batch(batch: pa.Table, with_bytes: bool = False,
                             columns=None) -> pa.Table:
    """map_batches kernel: events rows -> images rows (vectorized)."""
    ids = batch["event_id"].to_numpy(zero_copy_only=False)
    etype = batch["event_type"].to_numpy(zero_copy_only=False) \
        if "event_type" in batch.column_names else None
    return _derive_columns(ids, etype, with_bytes, columns)


def images_from_range_batch(batch, with_bytes: bool = True) -> pa.Table:
    """map_batches kernel over ray.data.range(n) ({'id': int64})."""
    if isinstance(batch, dict):
        ids = np.asarray(batch["id"], dtype=np.int64)
    else:
        ids = batch["id"].to_numpy(zero_copy_only=False)
    return _derive_columns(ids, None, with_bytes)


def images_dataset(sf_dir: str, with_bytes: bool = False, columns=None):
    """Ray Dataset of the corpus derived from `events` in sf_dir.
    Column-pruned at BOTH levels: only the parquet columns the requested
    derive needs leave the scan, and only requested columns are derived
    (captions/pixels are the expensive parts)."""
    import ray.data as rd

    read_cols = ["event_id"]
    if columns is None or "caption" in columns:
        read_cols.append("event_type")
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=read_cols)
    return ds.map_batches(
        lambda b: images_from_events_batch(b, with_bytes, columns),
        batch_format="pyarrow")


def images_range_dataset(n: int, with_bytes: bool = True, override_num_blocks: int | None = None):
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(lambda b: images_from_range_batch(b, with_bytes),
                          batch_format="pyarrow")


def versioned_images_dataset(sf_dir: str):
    """History-file corpus: each event becomes one VERSION of an image
    object — image_id = 'img' + zfill(event_id // 4), version =
    event_id % 4 + 1, position derived from the EVENT id (so different
    versions of one object sit at different coordinates; an extract with
    history must keep all versions of an object once any version
    matches). Exact integer arithmetic; SQL twin in VERSIONED_SQL_CTE."""
    import ray.data as rd

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id"])

    def derive(batch: pa.Table) -> pa.Table:
        eids = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vids = eids // 4
        lon = ((eids * 7919) % 36000) / 100.0 - 180.0
        lat = ((eids * 104729) % 17000) / 100.0 - 85.0
        image_id = np.char.add("img", np.char.zfill(vids.astype(str), 10))
        return pa.table({
            "image_id": pa.array(image_id, type=pa.string()),
            "version": pa.array((eids % 4 + 1).astype(np.int32)),
            "lon": pa.array(lon), "lat": pa.array(lat),
        })

    return ds.map_batches(derive, batch_format="pyarrow")


VERSIONED_SQL_CTE = """
versioned AS (
    SELECT
        'img' || lpad(CAST(event_id // 4 AS VARCHAR), 10, '0') AS image_id,
        CAST(event_id % 4 + 1 AS INTEGER) AS version,
        ((event_id * 7919) % 36000) / 100.0 - 180.0 AS lon,
        ((event_id * 104729) % 17000) / 100.0 - 85.0 AS lat
    FROM events
)
"""


# The exact-SQL twin of _derive_columns for the DuckDB oracle (no bytes —
# binary payloads are never part of oracle comparisons).
IMAGES_SQL_CTE = """
images AS (
    SELECT
        'img' || lpad(CAST(event_id AS VARCHAR), 10, '0') AS image_id,
        CAST(16 AS INTEGER) AS w,
        CAST(16 AS INTEGER) AS h,
        CASE WHEN event_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
        'caption ' || CAST(event_id AS VARCHAR) || ' ' || event_type AS caption,
        (event_id * 2654435761) % 1099511627776 AS phash,
        ((event_id * 7919) % 36000) / 100.0 - 180.0 AS lon,
        ((event_id * 104729) % 17000) / 100.0 - 85.0 AS lat
    FROM events
)
"""
