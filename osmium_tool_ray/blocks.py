"""Dataset block hygiene shared across pipelines.

Ray 2.49's groupby / map_groups chain emits zero-ROW zero-COLUMN blocks
for group-less inputs, map_batches short-circuits empty blocks (so a
normalizing UDF never sees them), and Dataset.join's per-partition
ArrowBlockBuilder then builds a schema-less table that crashes Acero.
Every pipeline that feeds a groupby chain into a join needs these.
"""

from __future__ import annotations

import ray as _ray

_remote_num_rows = _ray.remote(num_cpus=0)(lambda t: t.num_rows)


def _drop_empty_blocks(ds):
    """Rebuild a Dataset without its zero-row blocks. Only block refs and
    row counts touch the driver — the data stays in the object store.
    Returns None when every block is empty."""
    import ray

    refs = ds.to_arrow_refs()
    if not refs:
        return None
    nrows = ray.get([_remote_num_rows.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, nrows) if n]
    if not keep:
        return None
    import ray.data as rd
    return rd.from_arrow_refs(keep)
