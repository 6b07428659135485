"""Streaming joins — absent from the reference entirely (SURVEY.md
§2.4: "no stream-stream or stream-static joins"); first-class here.

- stream-static: enrich the event stream with a dimension table; the
  static side is broadcast per micro-batch, no state.
- stream-stream: purchases ⋈ views per user within a time bound;
  both sides watermarked so the join state is evicted once the
  watermark passes the bound (state is O(in-flight window), not
  O(stream history)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Broadcast-enrich a stream with a static dimension."""
    return stream.join(F.broadcast(dim), on, "left")


def purchases_after_views(
    enriched_stream: DataFrame,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each purchase matched to same-user views
    in the preceding `within` interval. Event-time constraints on
    both sides + watermarks bound the state store. how="left_outer"
    additionally emits view-less purchases (NULL view columns) once
    the watermark passes their match window — the streaming form of
    "purchases with no prior view"."""
    views = (
        enriched_stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        enriched_stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}")),
        how,
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts"))
        .cast("long")
        .alias("lag_seconds"),
    )
