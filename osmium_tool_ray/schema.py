"""Fixed Arrow schemas for every logical table (the reference has a fixed
schema per entity type — src/cmd.hpp:58 osm_entity_bits; nothing is
dynamically inferred).

The `images` table is exactly BASELINE.json input_hint's shape plus the
location columns every spatial op uses; `groups`/`group_members` re-express
way/relation adjacency (SURVEY.md §1.3); `images_v` is the versioned-history
shape used by time-filter / apply-changes / derive-changes equivalents.
"""

from __future__ import annotations

import pyarrow as pa

TAGS_TYPE = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))

IMAGES_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.large_binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("lon", pa.float64()),
    ("lat", pa.float64()),
])

GROUPS_SCHEMA = pa.schema([
    ("group_id", pa.string()),
    ("kind", pa.string()),           # "way" | "relation"
    ("tags", TAGS_TYPE),
])

GROUP_MEMBERS_SCHEMA = pa.schema([
    ("group_id", pa.string()),
    ("seq", pa.int32()),
    ("mtype", pa.string()),          # "node" | "way" | "relation"
    ("ref", pa.string()),
])

IMAGES_V_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("version", pa.int32()),
    ("visible", pa.bool_()),
    ("ts", pa.timestamp("s")),
    ("caption", pa.string()),
])
