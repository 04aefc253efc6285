"""Canonical query-key hashing (SURVEY.md §2-F fn-hash-key; reference
cache_manager.py:63-74).

Key formula: ``"{lat:.6f}_{lon:.6f}_{start}_{end}_{sorted(vars) joined
'_'}"`` → SHA-256 → first 16 hex chars. Implemented as JVM-side column
expressions (sha2/format_string/array_sort) so keying a whole relation
is a single projection.

Determinism note: %.6f formatting is only tie-free when inputs carry ≤6
exact decimal digits — canonicalize coordinates onto the grid (snap_lat/
snap_lon → 0.25 steps) BEFORE keying, exactly as the reference does
(it keys on actual_lat/actual_lon, pipeline/extract.py:128-137).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

KEY_LENGTH = 16


def query_key(
    lat: Column,
    lon: Column,
    start_date: Column,
    end_date: Column,
    variables: Column | Sequence[str],
) -> Column:
    """Build the 16-hex-char canonical cache key column."""
    if not isinstance(variables, Column):
        variables = F.array(*[F.lit(v) for v in variables])
    canonical = F.concat_ws(
        "_",
        F.format_string("%.6f", lat),
        F.format_string("%.6f", lon),
        start_date,
        end_date,
        F.array_join(F.array_sort(variables), "_"),
    )
    return F.substring(F.sha2(canonical, 256), 1, KEY_LENGTH)
