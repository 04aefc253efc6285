"""Join operators beyond vanilla equi-joins (SURVEY.md §2-C).

- `asof_join`: scalable as-of (nearest-preceding) join. Spark has no
  native ASOF; the idiomatic distributed formulation is union-the-
  timelines + `last(..., ignorenulls)` over a key-partitioned window —
  one shuffle on the key, no per-row lookups, no driver loop. This is
  the engine's generalization of the reference's arithmetic time
  alignment (reference config.py:115-135 date_to_time_index).
- `nearby_join`: bounded-radius θ-join with distance ranking (the
  reference's nearby-cache lookup, cache_manager.py:295-337).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_on <= left_on (within `by` groups).

    Plan shape: union of the two (tagged) timelines → single window
    sorted by (by, t, side) with right rows ordered before left rows at
    equal timestamps → `last(value, ignorenulls)` forward-fill → keep
    left rows. One exchange on `by`; at 100 TB the window state is a
    running scalar per value column, so no group materialization.
    Skewed `by` keys can be pre-salted by the caller if needed.
    """
    value_cols = list(value_cols if value_cols is not None else
                      [c for c in right.columns if c not in by and c != right_on])
    by = list(by)

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def nearby_join(
    points: DataFrame,
    probes: DataFrame,
    radius: float,
    point_coords: tuple[str, str] = ("latitude", "longitude"),
    probe_coords: tuple[str, str] = ("p_latitude", "p_longitude"),
) -> DataFrame:
    """θ-join: every (probe, point) pair within an L∞ radius, with L1
    and L2 distance columns (reference cache_manager.py:302-318).

    Physical plan: broadcast-nested-loop on the (small) probe side —
    the θ-predicate prevents a hash join, so keep probes tiny/broadcast.
    For a large-large spatial join, grid-bucket both sides to
    floor(coord/radius) cells and equi-join on the cell (documented
    scale path; the reference semantics only ever probe one point).
    """
    plat, plon = point_coords
    qlat, qlon = probe_coords
    pts = points
    pb = F.broadcast(probes)
    d_lat = F.abs(F.col(plat) - F.col(qlat))
    d_lon = F.abs(F.col(plon) - F.col(qlon))
    return (
        pts.join(pb, (d_lat < F.lit(radius)) & (d_lon < F.lit(radius)))
        .withColumn("l1_distance", d_lat + d_lon)
        .withColumn(
            "l2_distance",
            F.sqrt(F.pow(F.col(plat) - F.col(qlat), 2) + F.pow(F.col(plon) - F.col(qlon), 2)),
        )
    )
