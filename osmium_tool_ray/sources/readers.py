"""Container-format seam: Lance when available, Parquet otherwise.

BASELINE.json input_hint names Lance tables; this container ships pyarrow/
parquet but not pylance, so the reader/writer pair gates on an import-try
(the build brief's rule for absent libraries). All pipelines consume the
returned Dataset identically — the format choice is invisible past the
read. Column pruning (`columns=`) and pyarrow filter pushdown work in both
branches."""

from __future__ import annotations


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


HAVE_LANCE = _have_lance()


def read_parquet_clean(path, columns: list[str] | None = None, **kwargs):
    """read_parquet with schema metadata stripped AT THE SCAN. The
    testdata parquet carries a b'pandas' blob that makes hash(pa.Schema)
    raise, so every schema-unify — including the ones INSIDE the
    ReadParquet operator's block building, which run before any
    map_batches — logs "Failed to hash the schemas". Passing an explicit
    metadata-free (and column-pruned) schema makes every block clean
    from birth; the fused strip stays as a belt-and-braces for paths
    where the schema can't be pre-read (glob dirs, remote stores)."""
    import ray.data as rd

    from ..blocks import strip_schema_metadata

    if "schema" not in kwargs:
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
            sch = pq.read_schema(path)
            names = columns if columns is not None else sch.names
            kwargs["schema"] = pa.schema(
                [sch.field(c).remove_metadata() for c in names])
            # Ray sizes read tasks by the (compressed, column-pruned)
            # scan estimate, so a single multi-row-group file whose
            # in-memory footprint sits under the block target is read by
            # ONE task and only split AFTER decompression — a serial
            # ~seconds term in front of every consumer. When the file
            # offers row groups, ask for real read-task fan-out.
            if "override_num_blocks" not in kwargs:
                rgs = pq.ParquetFile(path).metadata.num_row_groups
                if rgs >= 8:
                    kwargs["override_num_blocks"] = min(rgs, 64)
        except Exception:
            pass  # directory/glob inputs: fall back to the fused strip
    return rd.read_parquet(path, columns=columns, **kwargs) \
        .map_batches(strip_schema_metadata, batch_format="pyarrow")


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """ray.data.read_lance when the path is a Lance dataset and pylance is
    installed; ray.data.read_parquet otherwise."""
    import ray.data as rd

    if HAVE_LANCE and str(path).rstrip("/").endswith(".lance"):
        return rd.read_lance(path, columns=columns, **kwargs)
    return read_parquet_clean(path, columns=columns, **kwargs)


from ..registry import register_sink, resolve_sink


@register_sink(".parquet")
def _sink_parquet(ds, path: str, **kwargs):
    return ds.write_parquet(path, **kwargs)


if HAVE_LANCE:  # pragma: no cover - pylance absent in this container
    @register_sink(".lance")
    def _sink_lance(ds, path: str, **kwargs):
        return ds.write_lance(path, **kwargs)


def write_table(ds, path: str, **kwargs):
    """Sink dispatch via the extension registry (SURVEY §2.9): longest
    registered suffix wins, parquet is the default — user packages add
    formats with @register_sink, mirroring the reference's ExportFormat
    factory table (src/export/export_format.hpp:35-115)."""
    return resolve_sink(path, default=_sink_parquet)(ds, path, **kwargs)
