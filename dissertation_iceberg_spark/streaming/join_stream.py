"""Stream-stream join: view→purchase attribution within a horizon.

The one stateful-join shape Structured Streaming supports natively:
both sides watermarked, an event-time range condition bounding how
long each side waits for its match. State per side is then
(rate × horizon + watermark) rows — independent of stream length —
and Spark evicts it automatically from the range condition; without
the time bound the join state would grow forever. Matches emit as
soon as both rows have arrived (inner join, append mode).

At 100 TB-rate streams both sides hash-partition on user_id, so the
join is co-located shuffle-to-shuffle — the same exchange plan as the
batch twin, plus state stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HORIZON = "1 hour"


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Purchases attributed to a preceding view by the same user within
    HORIZON. Works identically on batch frames (no watermark applied) —
    which is how the test pins streaming output == batch output."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        # NTZ -> LTZ (session tz pinned UTC): withWatermark requires it
        F.col("ts").cast("timestamp").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if v.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    joined = v.join(
        p,
        F.expr(
            "v_user = p_user"
            " AND purchase_ts >= view_ts"
            f" AND purchase_ts <= view_ts + INTERVAL {HORIZON}"
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.unix_micros("view_ts").alias("view_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )
