"""Extract (spatial join) map_batches stages.

The reference streams every object past up-to-500 Extract geometries
(/root/reference/src/extract/strategy.hpp:89-172, the 1xE fan-out loop).
Here that is ONE distributed pass: a stateful actor pool holds every
region's banded PIP index plus a cell-cover prefilter built once per actor
(__init__), and each Arrow batch is tested against all regions vectorized,
emitting matched rows tagged with `extract_id` (single pass instead of E
scans — SURVEY.md §4.2 "multi-output").

Cell prefilter: for each polygon region we classify cover cells at a fixed
level into interior (accept without exact test) / boundary (exact banded
PIP on just those rows) / outside (reject). This is the distributed
equivalent of the reference's envelope + banded-segment short-circuit
(extract_polygon.cpp:126-151) and is what keeps the exact kernel off the
hot path for most rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.cells import cell_encode
from ..functions.geometry import to_fix
from ..state.regions import Region, region_cover


def _get(ref):
    """Accept either a plain object or a ray.ObjectRef (broadcast via ray.put)."""
    try:
        import ray
        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except ImportError:  # pragma: no cover
        pass
    return ref


class CellEncode:
    """Stateless stage: append `cell` (int64 Z-order cell id) at `level`."""

    def __init__(self, level: int = 12, lon_col: str = "lon", lat_col: str = "lat",
                 out_col: str = "cell"):
        self.level, self.lon, self.lat, self.out = level, lon_col, lat_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = cell_encode(batch[self.lon].to_numpy(zero_copy_only=False),
                        batch[self.lat].to_numpy(zero_copy_only=False), self.level)
        return batch.append_column(self.out, pa.array(c.view(np.int64)))


class RegionMatcher:
    """Actor-pool stage: match each row's point against every region.

    mode="fanout": emit matched rows with an `extract_id` int32 column (a row
    in k regions appears k times) — the single-pass replacement for the
    reference's per-extract writer fan-out.
    mode="mask": append one bool column per region (`in_<name>`), no row
    duplication — used by strategies that only need the id sets.

    State (PIP indexes + cover sets) is built once per actor; pass regions
    through `ray.put` so E large polygon indexes ship once per node, not per
    batch.
    """

    def __init__(self, regions, level: int = 8, mode: str = "fanout",
                 lon_col: str = "lon", lat_col: str = "lat",
                 prefilter: bool = True):
        regions = _get(regions)
        self.mode = mode
        self.level = level
        self.lon_col, self.lat_col = lon_col, lat_col
        self.regions: list[Region] = list(regions)
        self.covers = []
        for reg in self.regions:
            if prefilter and reg.kind == "polygon":
                interior, boundary = region_cover(reg, level)
                # interior cells come at mixed (coarse..level) levels from the
                # quadtree; group them by level for ancestor-membership tests
                from ..functions.cells import cell_level
                lv = cell_level(interior)
                by_level = [(int(L), np.sort(interior[lv == L])) for L in np.unique(lv)]
                self.covers.append((by_level, np.sort(boundary)))
            else:
                self.covers.append(None)

    def _masks(self, batch: pa.Table) -> list[np.ndarray]:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        px, py = to_fix(lon), to_fix(lat)
        cells = None
        parent_cache: dict[int, np.ndarray] = {}
        masks = []
        for reg, cover in zip(self.regions, self.covers):
            if cover is None:
                masks.append(reg.contains_fix(px, py))
                continue
            if cells is None:
                cells = cell_encode(lon, lat, self.level)
                parent_cache[self.level] = cells
            interior_by_level, boundary = cover
            m = np.zeros(len(px), dtype=bool)
            for L, cset in interior_by_level:
                if L not in parent_cache:
                    from ..functions.cells import cell_parent
                    parent_cache[L] = cell_parent(cells, L)
                m |= _isin_sorted(parent_cache[L], cset)
            on_boundary = _isin_sorted(cells, boundary)
            if on_boundary.any():
                bidx = np.nonzero(on_boundary)[0]
                m[bidx] = reg.contains_fix(px[bidx], py[bidx])
            masks.append(m)
        return masks

    def __call__(self, batch: pa.Table) -> pa.Table:
        masks = self._masks(batch)
        if self.mode == "mask":
            for reg, m in zip(self.regions, masks):
                batch = batch.append_column(f"in_{reg.name}", pa.array(m))
            return batch
        parts = []
        for eid, m in enumerate(masks):
            if m.any():
                part = batch.filter(pa.array(m))
                parts.append(part.append_column(
                    "extract_id", pa.array(np.full(part.num_rows, eid, dtype=np.int32))))
        if not parts:
            empty = batch.slice(0, 0)
            return empty.append_column("extract_id", pa.array([], type=pa.int32()))
        return pa.concat_tables(parts)


# per-worker-process matcher cache for the stateless-task form (keyed by
# the broadcast ref so a new region set replaces the old matcher)
_MATCHER_CACHE: dict = {}


def region_match_batches(ds, regions_ref, level: int = 8, mode: str = "fanout",
                         lon_col: str = "lon", lat_col: str = "lat"):
    """RegionMatcher as STATELESS TASKS with a module-level worker cache:
    the matcher (PIP indexes + cell covers) builds once per worker process
    from the broadcast regions ref, and the map fuses with upstream stages
    — no actor-pool spin-up and no fixed pool size competing with other
    stages for CPU tokens (the bench `_fused_stage` pattern). Use the
    actor-pool class directly when the region set is too large to build
    on every worker."""
    key = (regions_ref.hex() if hasattr(regions_ref, "hex") else id(regions_ref),
           level, mode, lon_col, lat_col)

    def f(batch: pa.Table) -> pa.Table:
        m = _MATCHER_CACHE.get(key)
        if m is None:
            m = RegionMatcher(regions_ref, level, mode,
                              lon_col=lon_col, lat_col=lat_col)
            _MATCHER_CACHE.clear()
            _MATCHER_CACHE[key] = m
        return m(batch)

    return ds.map_batches(f, batch_format="pyarrow")


def _isin_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Membership of uint64 values in a sorted uint64 array (searchsorted —
    O(n log m), no hashing)."""
    if sorted_set.size == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_set, values)
    pos[pos == len(sorted_set)] = len(sorted_set) - 1
    return sorted_set[pos] == values
