"""Reference-native event path: queries over the ORIGINAL CityEvent
schema (city/event_type/severity/timestamp-string/description — the
JSON records the reference's producer emits,
producer/.../model/CityEvent.java:7-18).

The driver-corpus plans (citystream.py) DERIVE city/severity from the
synthetic events table; this module is the path a real reference user
feeds their actual Kafka topic through: parse JSON with the fixed
5-string schema (S2), type the event-time string, and reuse the same
windowed-agg core. `json_roundtrip` proves serialize→parse is
lossless against the generator."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.events import CITY_EVENT_JSON_SCHEMA


def parse_city_events(json_lines: DataFrame, col: str = "value") -> DataFrame:
    """S2: fixed-schema JSON decode + flatten + typed event time. The
    reference keeps `timestamp` a string and windows on wall clock
    (SURVEY.md §2.4 quirk); we add the typed column and window on it."""
    return (
        json_lines.select(
            F.from_json(F.col(col).cast("string"), CITY_EVENT_JSON_SCHEMA).alias("data")
        )
        .select("data.*")
        .withColumn("ts", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    )


def parse_city_events_with_dlq(
    json_lines: DataFrame, col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Parse with a dead-letter queue — the reference silently nulls
    malformed records (PERMISSIVE, no DLQ — SURVEY.md §1.4); at scale
    you want the rejects. Returns (good, dlq): good rows parsed fully
    (a record missing `city` counts as bad), dlq keeps the raw payload
    for replay."""
    parsed = json_lines.withColumn(
        "data", F.from_json(F.col(col).cast("string"), CITY_EVENT_JSON_SCHEMA)
    )
    good = (
        parsed.filter(F.col("data").isNotNull() & F.col("data.city").isNotNull())
        .select("data.*")
        .withColumn("ts", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    )
    dlq = parsed.filter(F.col("data").isNull() | F.col("data.city").isNull()).select(
        F.col(col).cast("string").alias("raw"),
        F.current_timestamp().alias("rejected_at"),
    )
    return good, dlq


def native_windowed_agg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """A1 over the native schema: identical shape to
    citystream.windowed_agg but city/severity come from the record."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "city", "event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.array_join(F.array_sort(F.collect_list("severity")), ",").alias("severities"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_updated"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "city",
            "event_type",
            "event_count",
            "severities",
            "last_updated",
        )
    )
