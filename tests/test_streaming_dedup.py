"""Streaming dedup: dropDuplicates with watermark over the raw stream
(the streaming twin of llm_dedup_exact — duplicate events arriving in
different micro-batches collapse to one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.plans.citystream import enrich_events
from real_time_event_streaming_pipeline_spark.catalog import normalize_events_ts
from real_time_event_streaming_pipeline_spark.sources.events import EVENTS_SCHEMA


def _write(spark, path, rows):
    spark.createDataFrame(
        [(i, int(ts * 1e9), u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_dedup_across_batches(spark, tmp_path):
    base = 1704067200
    stage = str(tmp_path / "in")
    # same event_id 7 arrives in two different micro-batches
    _write(spark, stage + "/b=0", [(7, base, 1, "view"), (8, base + 60, 1, "click")])

    dedup = (
        normalize_events_ts(
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage + "/b=*")
        )
        .transform(enrich_events)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    _write(spark, stage + "/b=1", [(7, base, 1, "view"), (9, base + 120, 2, "error")])
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT event_id FROM dedup_stream").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [7, 8, 9]  # the replayed 7 was suppressed by state


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark horizon are suppressed even when their event times
    differ slightly (the at-least-once-delivery case dropDuplicates'
    exact-match state can't express); state is evictable by time."""
    base = 1704067200
    stage = str(tmp_path / "in")
    _write(spark, stage + "/b=0", [(7, base, 1, "view"), (8, base + 60, 1, "click")])

    dedup = (
        normalize_events_ts(
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage + "/b=*")
        )
        .transform(enrich_events)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_wm_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    # the redelivered 7 carries a slightly different event time
    # (retry after 30 s) — still one logical event
    _write(
        spark,
        stage + "/b=1",
        [(7, base + 30, 1, "view"), (9, base + 120, 2, "error")],
    )
    q.processAllAvailable()
    q.stop()
    ids = sorted(
        r.event_id for r in spark.sql("SELECT event_id FROM dedup_wm_stream").collect()
    )
    assert ids == [7, 8, 9]
