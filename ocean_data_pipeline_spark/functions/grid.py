"""Grid coordinate⇄index conversion as column expressions (SURVEY.md
§2-F fn-grid-snap/fn-clamp; reference CoordinateConverter,
config.py:76-151).

The reference computes these per-request on the driver; here they are
pure Catalyst column expressions, so snapping a 100 TB table of
coordinates is one codegen'd projection — no UDF, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """Axis anchors/extents (reference GRID_CONFIG, config.py:24-47)."""

    lat_anchor: float = 55.0
    lat_min: float = 10.0
    lat_max: float = 55.0
    lat_cells: int = 91  # index 0..90
    lon_anchor: float = -85.0
    lon_min: float = -85.0
    lon_max: float = -70.0
    lon_cells: int = 61  # index 0..60
    resolution: float = 0.25


DEFAULT_GRID = GridSpec()


def clamp(col: Column, lo: float, hi: float) -> Column:
    """fn-clamp (reference config.py:83,96,131)."""
    return F.greatest(F.lit(lo), F.least(F.lit(hi), col))


def lat_to_index(lat: Column, grid: GridSpec = DEFAULT_GRID) -> Column:
    """lat → grid row index: round((anchor − clamp(lat)) / res), clamped.

    Reference config.py:77-87 (north-anchored axis, hence the minus).
    """
    idx = F.round((F.lit(grid.lat_anchor) - clamp(lat, grid.lat_min, grid.lat_max)) / F.lit(grid.resolution), 0)
    return clamp(idx, 0, grid.lat_cells - 1).cast("int")


def lon_to_index(lon: Column, grid: GridSpec = DEFAULT_GRID) -> Column:
    """lon → grid col index: round((clamp(lon) − anchor) / res), clamped.

    Reference config.py:89-100.
    """
    idx = F.round((clamp(lon, grid.lon_min, grid.lon_max) - F.lit(grid.lon_anchor)) / F.lit(grid.resolution), 0)
    return clamp(idx, 0, grid.lon_cells - 1).cast("int")


def index_to_lat(idx: Column, grid: GridSpec = DEFAULT_GRID) -> Column:
    """Inverse map (reference config.py:102-107)."""
    return F.lit(grid.lat_anchor) - idx * F.lit(grid.resolution)


def index_to_lon(idx: Column, grid: GridSpec = DEFAULT_GRID) -> Column:
    """Inverse map (reference config.py:108-112)."""
    return F.lit(grid.lon_anchor) + idx * F.lit(grid.resolution)


def snap_lat(lat: Column, grid: GridSpec = DEFAULT_GRID) -> Column:
    """Snap a latitude to its grid-cell center (canonicalization used for
    cache keying; reference pipeline/extract.py:128-137)."""
    return index_to_lat(lat_to_index(lat, grid), grid)


def snap_lon(lon: Column, grid: GridSpec = DEFAULT_GRID) -> Column:
    return index_to_lon(lon_to_index(lon, grid), grid)


def in_bbox(lat: Column, lon: Column, grid: GridSpec = DEFAULT_GRID) -> Column:
    """pred-bbox validation predicate (reference config.py:154-165)."""
    return lat.between(grid.lat_min, grid.lat_max) & lon.between(grid.lon_min, grid.lon_max)
