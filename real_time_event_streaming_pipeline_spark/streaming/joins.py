"""Streaming joins and streaming deduplication — absent from the
reference entirely (SURVEY.md §2.4: "no stream-stream or stream-static
joins"); first-class here.

- stream-static: enrich the event stream with a dimension table; the
  static side is broadcast per micro-batch, no state.
- stream-stream (user-keyed): purchases ⋈ views per user within a
  time bound; both sides watermarked so the join state is evicted
  once the watermark passes the bound (state is O(in-flight window),
  not O(stream history)).
- stream-stream (interval self-join): alerts ⋈ same-city follow-up
  events — the incremental view of the batch
  `plans.citystream.alert_followup_pairs`; tests pin streamed ==
  batch on the same input.
- streaming dedup: dropDuplicatesWithinWatermark keeps one
  (key → latest-ts) entry per key inside the watermark horizon —
  state bounded by rate × watermark, spilled to RocksDB
  (session.py), never O(stream history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import ALERT_SEVERITIES, event_key


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
        # coalesce: under full_outer an unmatched VIEW row has p_user
        # NULL but v_user known — the user must not be dropped
        F.coalesce(F.col("p_user"), F.col("v_user")).alias("user_id"),
        "purchase_id",
        "view_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts"))
        .cast("long")
        .alias("lag_seconds"),
    )


def alert_followups_stream(
    enriched: DataFrame,
    watermark: str = "10 minutes",
    horizon_sql: str = "INTERVAL 10 MINUTES",
) -> DataFrame:
    """Stream-stream interval self-join: alerts (high/critical) matched
    to events of the same city arriving within the horizon after them.
    Same columns as the batch `plans.citystream.alert_followup_pairs`;
    inner join, so append mode emits each pair exactly once as soon as
    both sides have arrived. The watermark bounds state AND results:
    a row arriving more than `watermark` late in event time is dropped
    before it can join, so pairs involving it are lost relative to the
    batch twin — the inherent stream-stream trade (streamed == batch
    only for input within the lateness bound; size `watermark` to the
    source's real disorder). (The batch twin
    buckets the equi key by time for shuffle parallelism; here Spark's
    stream-stream join keeps per-key state bounded by watermark +
    horizon instead — the state analogue of the same bound.)"""
    alerts = (
        enriched.filter(F.col("severity").isin(*ALERT_SEVERITIES))
        .select(
            F.col("event_id").alias("alert_id"),
            F.col("city").alias("a_city"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", watermark)
    )
    events = enriched.select(
        F.col("event_id").alias("follow_id"),
        F.col("city").alias("e_city"),
        F.col("ts").alias("e_ts"),
    ).withWatermark("e_ts", watermark)
    lag_us = F.unix_micros(F.col("e_ts")) - F.unix_micros(F.col("a_ts"))
    return alerts.join(
        events,
        (F.col("a_city") == F.col("e_city"))
        & (F.col("e_ts") > F.col("a_ts"))
        & (F.col("e_ts") <= F.col("a_ts") + F.expr(horizon_sql)),
    ).select("alert_id", "follow_id", F.col("a_city").alias("city"), lag_us.alias("lag_us"))


def dedup_events_stream(enriched: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact deduplication by event_key (city, type, second):
    first-writer-wins within the watermark horizon — the streaming twin
    of the batch `dropDuplicates`, and the ingest-side guard the
    reference gets implicitly from DynamoDB upserts (putItem by PK).
    Complements tests/test_streaming_dedup.py's event_id variants: the
    key here is the DERIVED upsert PK, so the stream pre-collapses what
    the sink would otherwise merge."""
    keyed = enriched.withColumn(
        "event_key", event_key(F.col("city"), F.col("event_type"), F.col("ts_iso"))
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_key"]
    )
