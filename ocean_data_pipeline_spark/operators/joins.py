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
    direction: str = "backward",
    bucket_width: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row closest in the given
    direction (within `by` groups): "backward" = latest right with
    right_on <= left_on (the policy-lookup / last-known-value join);
    "forward" = earliest right with right_on >= left_on (the
    next-deadline / next-event join); "nearest" = whichever of the two
    is closer in time, backward winning ties (pandas merge_asof
    contract). All inclusive at equal timestamps.

    Plan shape: union of the two (tagged) timelines → single window
    sorted by (by, t, side) with right rows ordered toward the fill
    direction at equal timestamps → `last`/`first(value, ignorenulls)`
    running fill → keep left rows. "nearest" evaluates both fills over
    the SAME sorted window (two frames, one sort, one exchange) and
    picks per-row by distance — equal-timestamp rights sort before
    left rows, so the backward fill sees them at distance 0 and the
    tie-break is structural. One exchange on `by`; at 100 TB the
    window state is a running scalar per value column, so no group
    materialization. Skewed `by` keys can be pre-salted by the caller.
    Distance for "nearest" compares `__t` cast to double — exact for
    integer keys below 2^53; for sub-microsecond-critical timestamp
    ties, pre-convert to long micros (unix_micros) in the caller.

    `bucket_width` (backward/forward only): with EMPTY `by` the window
    above is a single global sort — fine for keyed joins, row-scale
    for a global axis. Passing a width routes the running fill through
    the distributed running-agg device (operators/ranks.py): the fill
    becomes a running MAX of struct(order_key, side, value) —
    NULL-struct-skipping max IS last-non-null — bucketed by
    floor(key/width), K-way parallel with broadcast prefix offsets
    (forward = the same max on sign-flipped keys). Requires a numeric
    or castable-to-double order key. Tie nuance: duplicate (t, side)
    right rows resolve to the MAX value (deterministic) instead of the
    sort-order-dependent last — identical whenever right keys are
    unique, which a global as-of axis should guarantee anyway.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    value_cols = list(value_cols if value_cols is not None else
                      [c for c in right.columns if c not in by and c != right_on])
    by = list(by)
    # at equal __t the right row must fall INSIDE the left row's frame:
    # backward frame ends at current -> right sorts before left;
    # forward frame starts at current -> right sorts after left.
    # nearest uses the backward ordering (equal-t rights resolve to
    # distance 0 on the backward fill, which wins the tie anyway).
    left_side, right_side = (0, 1) if direction == "forward" else (1, 0)

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_on).alias("__t"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(right.schema[right_on].dataType).alias("__rt"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.col(right_on).alias("__t"),
        F.lit(right_side).alias("__side"),
        F.col(right_on).alias("__rt"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    if bucket_width is not None:
        if direction == "nearest":
            raise ValueError(
                "bucket_width supports backward/forward only (nearest "
                "needs both fills; run two bucketed passes instead)"
            )
        from ocean_data_pipeline_spark.operators.ranks import (
            with_running_aggs,
        )

        sign = 1.0 if direction == "backward" else -1.0
        keyed = unioned.withColumn(
            "__k1", F.col("__t").cast("double") * sign
        ).withColumn("__k2", F.col("__side").cast("int") * F.lit(int(sign)))
        for c in value_cols:
            keyed = keyed.withColumn(
                f"__s_{c}",
                F.when(
                    F.col(f"__v_{c}").isNotNull(),
                    F.struct(
                        F.col("__k1").alias("k1"),
                        F.col("__k2").alias("k2"),
                        F.col(f"__v_{c}").alias("v"),
                    ),
                ),
            )
        run = with_running_aggs(
            keyed,
            ["__k1", "__k2"],
            "__k1",
            {f"__f_{c}": (f"__s_{c}", "max", True) for c in value_cols},
            partition_by=by,
            bucket_width=bucket_width,
        )
        out = run.filter(F.col("__side") == left_side).select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__f_{c}").getField("v").alias(c) for c in value_cols],
        )
        return out

    base = Window.partitionBy(*by).orderBy(F.col("__t"), F.col("__side"))
    wb = base.rowsBetween(Window.unboundedPreceding, 0)
    wf = base.rowsBetween(0, Window.unboundedFollowing)
    if direction == "backward":
        fills = [F.last(f"__v_{c}", ignorenulls=True).over(wb).alias(c) for c in value_cols]
    elif direction == "forward":
        fills = [F.first(f"__v_{c}", ignorenulls=True).over(wf).alias(c) for c in value_cols]
    else:  # nearest: both fills share the one sorted exchange
        b_t = F.last("__rt", ignorenulls=True).over(wb)
        f_t = F.first("__rt", ignorenulls=True).over(wf)
        use_b = f_t.isNull() | (
            b_t.isNotNull()
            & (
                (F.col("__t").cast("double") - b_t.cast("double"))
                <= (f_t.cast("double") - F.col("__t").cast("double"))
            )
        )
        fills = [
            F.when(use_b, F.last(f"__v_{c}", ignorenulls=True).over(wb))
            .otherwise(F.first(f"__v_{c}", ignorenulls=True).over(wf))
            .alias(c)
            for c in value_cols
        ]
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *fills,
    )
    return filled.filter(F.col("__side") == left_side).drop("__side")


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
