"""Region model + config parsers (driver-side, pure Python/numpy).

Semantics mirror the reference's extract geometry configuration:

  * bbox string "LONG1,LAT1,LONG2,LAT2" with corner-order normalization via
    box-extend (/root/reference/src/util.cpp:210-234) and JSON bbox forms —
    4-number array or {left,right,top,bottom} object with coordinate range
    checks and left<right / bottom<top for the object form
    (/root/reference/src/command_extract.cpp:79-170).
  * GeoJSON polygon arrays: first ring outer (normalized CCW), rest inner
    (normalized CW), >=3 points per ring, locations validated
    (/root/reference/src/extract/geojson_file_parser.cpp:76-141); Feature /
    FeatureCollection / Polygon / MultiPolygon accepted.
  * Osmosis .poly files: first line ignored, sections of rings each ending
    in END, '!'-prefixed section name = inner ring, auto-close rings,
    orientation normalized, final END ends the polygon
    (/root/reference/src/extract/poly_file_parser.cpp:65-148).
  * extract config JSON: top-level object with "extracts" array (<= 500,
    command_extract.cpp:77) and optional "directory"; each extract has
    "output" + exactly one of bbox/polygon/multipolygon.

Regions hold a prebuilt BandedPolygonIndex so they can be shipped once to
actor pools (ray.put) and used for vectorized membership tests.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..functions.geometry import ensure_closed, is_ccw, to_fix
from ..functions.pip import BandedPolygonIndex, bbox_contains_fix

MAX_EXTRACTS = 500  # command_extract.cpp:77


class ConfigError(ValueError):
    """Mirrors the reference's config_error / poly_error / geojson_error."""


@dataclass
class Region:
    """One extract region: a name/output plus bbox or (multi)polygon geometry."""

    name: str
    kind: str  # "bbox" | "polygon"
    bbox: tuple[float, float, float, float] | None = None  # lon0, lat0, lon1, lat1 (min/max)
    rings: list[np.ndarray] = field(default_factory=list)  # closed, orientation-normalized
    _index: BandedPolygonIndex | None = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        if self.kind == "polygon" and self._index is None:
            self._index = BandedPolygonIndex(self.rings)

    def contains_fix(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        if self.kind == "bbox":
            lon0, lat0, lon1, lat1 = self.bbox
            return bbox_contains_fix(px, py, int(to_fix(lon0)), int(to_fix(lat0)),
                                     int(to_fix(lon1)), int(to_fix(lat1)))
        return self._index.contains_fix(px, py)

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return self.contains_fix(to_fix(lon), to_fix(lat))

    def envelope(self) -> tuple[float, float, float, float]:
        if self.kind == "bbox":
            return self.bbox
        ix = self._index
        return (ix.x_min / 1e7, ix.y_min / 1e7, ix.x_max / 1e7, ix.y_max / 1e7)

    def __getstate__(self):
        d = dict(self.__dict__)
        return d  # the index is numpy arrays; pickling it into actors is intended


def region_cover(region: Region, level: int,
                 start_level: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Classify the cells covering a region at `level` into
    (interior_cells, boundary_cells) — both uint64 arrays.

    interior: the whole cell rectangle is inside the region (rows accepted
    without an exact PIP test); boundary: the region's edge may cross the
    cell (rows need the exact kernel). Cells not returned are fully outside.

    Method: quadtree refinement from `start_level`. A cell with no segment
    bounding box overlapping it cannot be crossed by the boundary, so its
    center's PIP result classifies it whole; overlapping cells are split
    until `level`, where they become boundary cells. Conservative (segment
    bboxes padded by one fixed-point unit), so exactness is preserved — the
    prefilter only routes rows, never decides membership on boundary cells.
    """
    from ..functions.cells import cell_bounds, cover_bbox, cell_to_xy, xy_to_cell

    if region.kind == "bbox":
        lon0, lat0, lon1, lat1 = region.bbox
        cells = cover_bbox(lon0, lat0, lon1, lat1, level)
        clon0, clat0, clon1, clat1 = cell_bounds(cells)
        x0, y0 = to_fix(lon0), to_fix(lat0)
        x1, y1 = to_fix(lon1), to_fix(lat1)
        inside = ((to_fix(clon0) >= x0) & (to_fix(clat0) >= y0)
                  & (to_fix(clon1) <= x1) & (to_fix(clat1) <= y1))
        return cells[inside], cells[~inside]

    ix = region._index
    segs = ix._seg_by_band  # includes duplicates across bands; fine for bbox tests
    sx0 = np.minimum(segs[:, 0], segs[:, 2]) - 1
    sx1 = np.maximum(segs[:, 0], segs[:, 2]) + 1
    sy0 = np.minimum(segs[:, 1], segs[:, 3]) - 1
    sy1 = np.maximum(segs[:, 1], segs[:, 3]) + 1

    env = region.envelope()
    lvl = min(start_level, level)
    # pad by one fixed-point unit (1e-7 deg): a float lon/lat up to half a
    # unit outside the unpadded envelope can still to_fix() onto a boundary
    # vertex and be inside per the exact kernel's endpoint-inclusion rule —
    # mirrors the +-1 padding already applied to segment bboxes above
    pad = 1e-7
    cells = cover_bbox(env[0] - pad, env[1] - pad, env[2] + pad, env[3] + pad,
                       lvl)
    interior: list[np.ndarray] = []
    boundary: list[np.ndarray] = []
    while len(cells):
        clon0, clat0, clon1, clat1 = cell_bounds(cells)
        cx0, cy0 = to_fix(clon0), to_fix(clat0)
        cx1, cy1 = to_fix(clon1), to_fix(clat1)
        # does any segment bbox overlap each cell rect?
        overlap = ~((sx1[None, :] < cx0[:, None]) | (sx0[None, :] > cx1[:, None])
                    | (sy1[None, :] < cy0[:, None]) | (sy0[None, :] > cy1[:, None]))
        touched = overlap.any(axis=1)
        clean = ~touched
        if clean.any():
            cen_in = ix.contains_fix(((cx0[clean] + cx1[clean]) // 2),
                                     ((cy0[clean] + cy1[clean]) // 2))
            keep = cells[clean][cen_in]
            if keep.size:
                interior.append(keep)  # kept at whatever level the quadtree resolved
        if lvl == level:
            boundary.append(cells[touched])
            break
        # refine touched cells one level down
        x, y = cell_to_xy(cells[touched])
        nx = np.repeat(x * 2, 4) + np.tile([0, 1, 0, 1], len(x))
        ny = np.repeat(y * 2, 4) + np.tile([0, 0, 1, 1], len(y))
        lvl += 1
        cells = xy_to_cell(nx, ny, lvl)
    interior_cells = np.concatenate(interior) if interior else np.empty(0, np.uint64)
    boundary_cells = np.concatenate(boundary) if boundary else np.empty(0, np.uint64)
    return interior_cells, boundary_cells


def _check_lon(v: float) -> float:
    if not isinstance(v, (int, float)) or isinstance(v, bool):
        raise ConfigError("'bbox' array elements must be numbers.")
    if v < -180.0 or v > 180.0:
        raise ConfigError(f"Invalid coordinate in bbox: {v}.")
    return float(v)


def _check_lat(v: float) -> float:
    if not isinstance(v, (int, float)) or isinstance(v, bool):
        raise ConfigError("'bbox' array elements must be numbers.")
    if v < -90.0 or v > 90.0:
        raise ConfigError(f"Invalid coordinate in bbox: {v}.")
    return float(v)


def parse_bbox_value(value) -> tuple[float, float, float, float]:
    """JSON bbox: array [l0,b0,l1,t1] (corner order free, normalized via
    min/max like osmium::Box::extend) or object {left,right,top,bottom}
    (strict left<right, bottom<top). command_extract.cpp:79-170."""
    if isinstance(value, (list, tuple)):
        if len(value) != 4:
            raise ConfigError("'bbox' must be an array with exactly four elements.")
        lon_a, lat_a = _check_lon(value[0]), _check_lat(value[1])
        lon_b, lat_b = _check_lon(value[2]), _check_lat(value[3])
        return (min(lon_a, lon_b), min(lat_a, lat_b), max(lon_a, lon_b), max(lat_a, lat_b))
    if isinstance(value, dict):
        missing = {"left", "right", "top", "bottom"} - set(value)
        if missing:
            raise ConfigError("Need 'left', 'right', 'top', and 'bottom' members in 'bbox' object.")
        left, right = _check_lon(value["left"]), _check_lon(value["right"])
        top, bottom = _check_lat(value["top"]), _check_lat(value["bottom"])
        if not (left < right and bottom < top):
            raise ConfigError("Need 'left' < 'right' and 'bottom' < 'top' in 'bbox' object.")
        return (left, bottom, right, top)
    raise ConfigError("'bbox' member is not an array or object.")


def parse_bbox_string(s: str, option_name: str = "--bbox") -> tuple[float, float, float, float]:
    """CLI bbox "LONG1,LAT1,LONG2,LAT2" (/root/reference/src/util.cpp:210-234)."""
    parts = s.split(",")
    if len(parts) != 4:
        raise ConfigError(f"Need exactly four coordinates in {option_name} option.")
    try:
        vals = [float(p) for p in parts]
    except ValueError as e:
        raise ConfigError(f"Invalid bounding box in {option_name} option. "
                          "Format is LONG1,LAT1,LONG2,LAT2.") from e
    lon_a, lat_a, lon_b, lat_b = vals
    for v, chk in ((lon_a, _check_lon), (lat_a, _check_lat), (lon_b, _check_lon), (lat_b, _check_lat)):
        chk(v)
    return (min(lon_a, lon_b), min(lat_a, lat_b), max(lon_a, lon_b), max(lat_a, lat_b))


def _validate_ring_coords(ring) -> np.ndarray:
    if not isinstance(ring, (list, tuple)):
        raise ConfigError("Ring must be an array.")
    if len(ring) < 3:
        raise ConfigError("Ring must contain at least three coordinate pairs.")
    pts = []
    for item in ring:
        if not isinstance(item, (list, tuple)) or len(item) < 2 or \
                not all(isinstance(c, (int, float)) and not isinstance(c, bool) for c in item[:2]):
            raise ConfigError("Coordinates array must contain numbers.")
        lon, lat = float(item[0]), float(item[1])
        if lon < -180.0 or lon > 180.0 or lat < -90.0 or lat > 90.0:
            raise ConfigError(f"Invalid location in boundary (multi)polygon: ({lon}, {lat}).")
        pts.append((lon, lat))
    return np.asarray(pts, dtype=np.float64)


def parse_rings_array(value) -> list[np.ndarray]:
    """One polygon = array of rings; ring 0 outer (-> CCW), rest inner (-> CW).
    geojson_file_parser.cpp:94-141 (reversal of wrong-wound rings)."""
    if not isinstance(value, (list, tuple)) or len(value) == 0:
        raise ConfigError("Polygon must contain at least one ring.")
    rings = []
    outer = _validate_ring_coords(value[0])
    outer = ensure_closed(outer)
    if not is_ccw(outer):
        outer = outer[::-1].copy()
    rings.append(outer)
    for inner_val in value[1:]:
        inner = ensure_closed(_validate_ring_coords(inner_val))
        if is_ccw(inner):
            inner = inner[::-1].copy()
        rings.append(inner)
    return rings


def parse_geojson_geometry(geom) -> list[np.ndarray]:
    """Accept Feature/FeatureCollection/Polygon/MultiPolygon GeoJSON objects."""
    if not isinstance(geom, dict):
        raise ConfigError("Top-level value must be an object.")
    t = geom.get("type")
    if t == "FeatureCollection":
        feats = geom.get("features")
        if not feats:
            raise ConfigError("Missing or empty 'features' array.")
        return parse_geojson_geometry(feats[0])
    if t == "Feature":
        return parse_geojson_geometry(geom.get("geometry") or {})
    if t == "Polygon":
        return parse_rings_array(geom.get("coordinates"))
    if t == "MultiPolygon":
        coords = geom.get("coordinates")
        if not isinstance(coords, (list, tuple)) or len(coords) == 0:
            raise ConfigError("Multipolygon must contain at least one polygon array.")
        rings: list[np.ndarray] = []
        for poly in coords:
            rings.extend(parse_rings_array(poly))
        return rings
    raise ConfigError(f"Expect 'type' to be Polygon/MultiPolygon/Feature/FeatureCollection, got '{t}'.")


def parse_geojson_file(path: str) -> list[np.ndarray]:
    with open(path) as f:
        try:
            doc = json.load(f)
        except json.JSONDecodeError as e:
            raise ConfigError(f"In file '{path}':\n{e}") from e
    return parse_geojson_geometry(doc)


def parse_poly_file(path: str) -> list[np.ndarray]:
    """Osmosis .poly format (/root/reference/src/extract/poly_file_parser.cpp:65-148)."""
    with open(path) as f:
        data = f.read().split("\n")
    data = [ln.rstrip("\r") for ln in data if ln != ""]
    if not data:
        raise ConfigError(f"File '{path}' is empty.")
    rings: list[np.ndarray] = []
    i = 0
    n = len(data)
    while i < n:  # one (multi)polygon section per iteration
        i += 1  # ignore first line (polygon name)
        section_rings = 0
        saw_end = False
        while i < n:
            if data[i] == "END":
                i += 1
                saw_end = True
                break
            # ring: optional '!'-prefixed name line, then coords until END
            is_inner = data[i].startswith("!")
            i += 1
            coords = []
            ring_closed = False
            while i < n:
                if data[i] == "END":
                    if len(coords) < 3:
                        raise ConfigError(f"In file '{path}' on line {i + 1}:\n"
                                          "Expected at least three lines with coordinates.")
                    ring_closed = True
                    i += 1
                    break
                parts = data[i].split()
                try:
                    lon, lat = float(parts[0]), float(parts[1])
                except (IndexError, ValueError) as e:
                    raise ConfigError(f"In file '{path}' on line {i + 1}:\n"
                                      "Expected coordinates or 'END' to end the ring.") from e
                if lon < -180.0 or lon > 180.0 or lat < -90.0 or lat > 90.0:
                    raise ConfigError(
                        f"Invalid location in boundary (multi)polygon: ({lon}, {lat}).")
                coords.append((lon, lat))
                i += 1
            if not ring_closed:
                raise ConfigError(f"In file '{path}' on line {i}:\n"
                                  "Expected coordinates or 'END' to end the ring.")
            ring = ensure_closed(np.asarray(coords, dtype=np.float64))
            if is_inner:
                if is_ccw(ring):
                    ring = ring[::-1].copy()
            else:
                if not is_ccw(ring):
                    ring = ring[::-1].copy()
            rings.append(ring)
            section_rings += 1
        if not saw_end and section_rings == 0:
            raise ConfigError(f"In file '{path}':\nExpected 'END' for end of (multi)polygon.")
        if saw_end and section_rings == 0 and not rings:
            raise ConfigError(f"In file '{path}' on line {i}:\n"
                              "Need at least one ring in (multi)polygon.")
    if not rings:
        raise ConfigError(f"In file '{path}':\nNeed at least one ring in (multi)polygon.")
    return rings


def parse_polygon_file(directory: str, file_name: str, file_type: str = "") -> list[np.ndarray]:
    """File-type autodetection by suffix (command_extract.cpp:203-217)."""
    if not file_name:
        raise ConfigError("Missing 'file_name' in '(multi)polygon' object.")
    if not file_name.startswith("/"):
        file_name = os.path.join(directory, file_name)
    if not file_type:
        if file_name.endswith(".poly"):
            file_type = "poly"
        elif file_name.endswith((".json", ".geojson")):
            file_type = "geojson"
    if file_type == "poly":
        return parse_poly_file(file_name)
    if file_type == "geojson":
        return parse_geojson_file(file_name)
    if not file_type:
        raise ConfigError("Could not autodetect file type in '(multi)polygon' object. "
                          "Add a 'file_type'.")
    raise ConfigError(f"Unknown file type: '{file_type}' in '(multi)polygon.file_type'")


def parse_extract_config(config: dict | str, directory: str = "") -> list[Region]:
    """Config JSON (a dict, a JSON string, or a path to a .json file) ->
    list of Regions. Mirrors CommandExtract::parse_config_file."""
    if isinstance(config, str):
        if config.lstrip().startswith("{"):
            config = json.loads(config)
        else:
            directory = directory or os.path.dirname(os.path.abspath(config))
            with open(config) as f:
                config = json.load(f)
    if not isinstance(config, dict):
        raise ConfigError("Top-level value must be an object.")
    directory = config.get("directory", directory) or ""
    extracts = config.get("extracts")
    if extracts is None:
        raise ConfigError("Missing 'extracts' member in top-level object.")
    if not isinstance(extracts, list):
        raise ConfigError("'extracts' member must be an array.")
    if len(extracts) > MAX_EXTRACTS:
        raise ConfigError(f"Too many extracts in config file (maximum is {MAX_EXTRACTS}).")
    regions: list[Region] = []
    for ex in extracts:
        if not isinstance(ex, dict):
            raise ConfigError("Members in 'extracts' array must be objects.")
        output = ex.get("output")
        if not output:
            raise ConfigError("Missing 'output' member in extract object.")
        keys = [k for k in ("bbox", "polygon", "multipolygon") if k in ex]
        if len(keys) != 1:
            raise ConfigError("Need exactly one of 'bbox', 'polygon', or 'multipolygon' "
                              "in extract object.")
        k = keys[0]
        if k == "bbox":
            regions.append(Region(name=str(output), kind="bbox", bbox=parse_bbox_value(ex["bbox"])))
        else:
            v = ex[k]
            if isinstance(v, dict):
                rings = parse_polygon_file(directory, v.get("file_name", ""),
                                           v.get("file_type", ""))
            elif k == "polygon":
                rings = parse_rings_array(v)
            else:
                if not isinstance(v, list) or len(v) == 0:
                    raise ConfigError("Multipolygon must contain at least one polygon array.")
                rings = []
                for poly in v:
                    rings.extend(parse_rings_array(poly))
            regions.append(Region(name=str(output), kind="polygon", rings=rings))
    return regions
