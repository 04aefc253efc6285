"""Stream-stream joins (SURVEY.md §2-H capability class).

Structured Streaming's stream-stream inner join requires BOTH sides
watermarked and a time-bound join condition so the engine can bound
the buffered state: a view row can only match purchases within the
attribution horizon, so once the watermark passes view_ts + horizon
the row's state is reclaimed. The same builder runs in batch mode
(no watermark) — the oracle-checkable twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_conversions(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Attribute each purchase to same-user views in the preceding
    `horizon`: join on user with the purchase time bounded to
    [view_ts, view_ts + horizon]. Output one row per (view, purchase)
    pair with the conversion delay in seconds.

    how="left_outer" additionally emits each UNCONVERTED view exactly
    once (NULL purchase columns) — but only after the watermark passes
    view_ts + horizon, when the engine can prove no future purchase
    can match. That is the streaming funnel-abandonment query; in
    batch mode it's an ordinary left join.

    State bound: each side buffers at most `watermark + horizon` of
    events per user — the join condition's time bound is what lets the
    engine prove that and evict.
    """
    v = views.select(F.col("user_id"), F.col("ts").alias("view_ts"))
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if v.isStreaming:
        v = v.withWatermark("view_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (v.user_id == p.p_user_id)
        & (p.purchase_ts >= v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr(f"INTERVAL {horizon}"))
    )
    # key coalesced across sides: on full_outer an orphan purchase has
    # a NULL view side, and its user id lives in p_user_id (no-op for
    # inner/left_outer, where the sides agree whenever both exist)
    return v.join(p, cond, how).select(
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "purchase_value",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")).alias("delay_sec"),
    )
