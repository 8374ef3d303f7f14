"""cat — concatenate N inputs, select object types, scrub attributes.

Reference: /root/reference/src/command_cat.cpp:156-235 (copy loop :100-108,
entity-bit selection via --object-type, format conversion implicit in
reader/writer choice) and the --clean attribute scrub
(/root/reference/src/option_clean.cpp:53-71 — zero out any of
version/changeset/timestamp/uid/user in-place).

Ray restatement: pure streaming — union of reads, an optional vectorized
column scrub, no shuffle anywhere. Format conversion is the read/write
format pair (parquet <-> lance <-> json)."""

from __future__ import annotations

import pyarrow as pa

# graft attribute -> neutral value (the reference zeroes ids/timestamps and
# empties user strings)
CLEANABLE_DEFAULTS = {
    "version": 0,
    "changeset": 0,
    "timestamp": None,
    "uid": 0,
    "user": "",
    "phash": 0,
    "caption": "",
}


def clean_batch(batch: pa.Table, attrs: list[str]) -> pa.Table:
    for a in attrs:
        if a not in batch.schema.names:
            continue
        if a not in CLEANABLE_DEFAULTS:
            raise ValueError(f"Unknown attribute '{a}' in --clean option.")
        field = batch.schema.field(a)
        default = CLEANABLE_DEFAULTS[a]
        col = pa.nulls(batch.num_rows, type=field.type) if default is None else \
            pa.array([default] * batch.num_rows, type=field.type)
        batch = batch.set_column(batch.schema.get_field_index(a), a, col)
    return batch


def cat(datasets: list, object_types: list[str] | None = None,
        type_col: str = "kind", clean: list[str] | None = None,
        columns: list[str] | None = None):
    """Union datasets -> optional type filter -> optional clean -> optional
    projection. Entirely map-side."""
    import pyarrow.compute as pc

    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)

    if object_types is not None:
        wanted = pa.array(list(object_types), type=pa.string())

        def tfilter(batch: pa.Table) -> pa.Table:
            if type_col not in batch.schema.names:
                return batch
            return batch.filter(pc.is_in(batch[type_col], value_set=wanted))

        ds = ds.map_batches(tfilter, batch_format="pyarrow")

    if clean:
        attrs = list(clean)
        ds = ds.map_batches(lambda b: clean_batch(b, attrs), batch_format="pyarrow")

    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
