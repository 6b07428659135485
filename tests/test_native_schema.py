"""Reference-native CityEvent path: JSON roundtrip + windowed agg over
the original 5-field schema, fed by the S6 generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.plans.native import (
    native_windowed_agg,
    parse_city_events,
)
from real_time_event_streaming_pipeline_spark.sources.generator import city_event_batch


def _jsonized(spark, n=400):
    """Generator events serialized the way the producer does
    (Jackson → JSON string per record)."""
    ev = city_event_batch(spark, n)
    return ev.select(
        F.to_json(
            F.struct("city", "event_type", "severity", "timestamp", "description")
        ).alias("value")
    )


def test_json_roundtrip_lossless(spark):
    src = city_event_batch(spark, 300)
    parsed = parse_city_events(_jsonized(spark, 300))
    a = {tuple(r) for r in src.select("city", "event_type", "severity", "timestamp").collect()}
    b = {tuple(r) for r in parsed.select("city", "event_type", "severity", "timestamp").collect()}
    assert a == b


def test_native_windowed_agg(spark):
    parsed = parse_city_events(_jsonized(spark, 720))
    agg = native_windowed_agg(parsed)
    rows = agg.collect()
    # generator: 1 event / 5 s → 60 events per 5-min window across all
    # cities; total must be preserved
    assert sum(r.event_count for r in rows) == 720
    assert {len(r.window_start) for r in rows} == {19}
    # severities are sorted comma-joined lists
    for r in rows[:5]:
        parts = r.severities.split(",")
        assert parts == sorted(parts)


def test_malformed_json_yields_nulls_permissive(spark):
    """Reference behavior preserved: from_json is PERMISSIVE — bad
    records become null rows, not failures (SURVEY.md §1.4)."""
    bad = spark.createDataFrame([("not json",), ('{"city":"SF"}',)], "value string")
    parsed = parse_city_events(bad)
    rows = parsed.collect()
    assert len(rows) == 2
    assert any(r.city is None for r in rows)  # malformed → nulls
    assert any(r.city == "SF" and r.event_type is None for r in rows)  # partial ok
