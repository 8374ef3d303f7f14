"""Semi-structured column flattening — extract typed fields out of a
JSON-string props column into first-class Arrow columns.

The reference's closest relative is OPL tag parsing
(/root/reference/src/... OPL reader: key=value pairs unpacked into typed
fields per row); here the per-row container is a JSON object string and
the extraction is a single vectorized RE2 pass (pc.extract_regex), so
the stage is map-side, zero-copy in, and exact-oracled against DuckDB's
json_extract on the same rows.

Scale shape: stateless map_batches (the compiled pattern lives in actor
state when run as a class); no shuffle, no Python per-row loop. For
deeply nested payloads swap the regex for a real JSON parser inside the
same actor seam — the Ray-side plumbing is identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class JsonFieldExtract:
    """Extract one integer field (`"<key>": <digits>`) from a flat JSON
    object column into an int64 column named after the key. Rows where
    the key is absent get null."""

    def __init__(self, props_col: str = "props", key: str = "k",
                 out_col: str | None = None):
        self.props_col = props_col
        self.key = key
        self.out_col = out_col or key
        # RE2: the quoted key, optional spacing, a signed integer value
        self.pattern = rf'"{key}"\s*:\s*(?P<v>-?\d+)'

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch[self.props_col], pattern=self.pattern)
        v = pc.struct_field(m, "v").cast(pa.int64())
        return batch.append_column(self.out_col, v)
