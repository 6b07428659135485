"""Stream-stream joins and streaming deduplication — Structured
Streaming capabilities beyond the reference's 4 queries (which are all
single-stream; SURVEY.md §2.4 extensions).

Both operators follow the repo's streaming doctrine (SURVEY.md §7.0):
the batch plan is the source of truth — `alert_followups_stream` is
the incremental view of `plans.citystream.alert_followup_pairs`, and
`dedup_events_stream` of the batch one-row-per-event_key distinct —
and tests pin streamed == batch on the same input.

State posture at scale:
- The interval join keeps both sides' state keyed by city, evicted by
  watermark + the join's time bound (Spark derives the other side's
  state horizon from the range condition, SIGMOD'18 §5): per-key state
  is bounded by rate × (watermark + horizon), independent of stream
  length.
- dropDuplicatesWithinWatermark keeps one (key → latest-ts) entry per
  key seen inside the watermark horizon — bounded the same way, and
  the RocksDB state store (session.py) spills it to disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import ALERT_SEVERITIES, event_key


def alert_followups_stream(
    enriched: DataFrame,
    watermark: str = "10 minutes",
    horizon_sql: str = "INTERVAL 10 MINUTES",
) -> DataFrame:
    """Stream-stream interval self-join: alerts (high/critical) matched
    to events of the same city arriving within `horizon` after them.
    Same columns and semantics as the batch
    `plans.citystream.alert_followup_pairs`; inner join, so append mode
    emits each pair exactly once as soon as both sides have arrived —
    the watermark only bounds state, never results."""
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
    dropDuplicatesWithinWatermark (not plain dropDuplicates) so state
    for keys older than the watermark is evicted instead of growing
    with the stream."""
    keyed = enriched.withColumn(
        "event_key", event_key(F.col("city"), F.col("event_type"), F.col("ts_iso"))
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_key"]
    )
