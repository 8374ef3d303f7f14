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


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """ray.data.read_lance when the path is a Lance dataset and pylance is
    installed; ray.data.read_parquet otherwise."""
    import ray.data as rd

    if HAVE_LANCE and str(path).rstrip("/").endswith(".lance"):
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    """write_lance / write_parquet by suffix + availability."""
    if HAVE_LANCE and str(path).rstrip("/").endswith(".lance"):
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
