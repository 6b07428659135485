"""Reference-exact processing-time mode and sink retry idempotence
(the 'exactly-once' contract: foreachBatch may re-run an epoch after
failure; the upsert sink must absorb the replay)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.sources import events_file_stream
from real_time_event_streaming_pipeline_spark.streaming.pipeline import (
    PipelineConfig,
    run_to_completion,
    start_pipeline,
)
from real_time_event_streaming_pipeline_spark.streaming.sinks import upsert_parquet


def test_processing_time_mode(spark, sf_small, tmp_path):
    """use_event_time=False reproduces the reference quirk
    (SURVEY.md §2.4): windows keyed on ingest wall clock, so every
    event of a micro-batch lands in the 'now' bucket and true late
    data cannot exist. Structural assertions only — wall clock is
    nondeterministic by definition."""
    cfg = PipelineConfig(out_dir=str(tmp_path), use_event_time=False)
    queries = start_pipeline(spark, events_file_stream(spark, sf_small), cfg)
    run_to_completion(queries)
    agg = spark.read.parquet(cfg.path("aggregations"))
    # all 1000 events counted, but windows collapse to the few wall-
    # clock buckets the run spanned (event time spans 30 days → would
    # be ~1000 distinct windows in event-time mode)
    assert agg.agg(F.sum("event_count")).first()[0] == 1000
    assert agg.select("window_start").distinct().count() <= 3


def test_upsert_sink_epoch_replay_idempotent(spark, tmp_path):
    """Replaying the same epoch (task retry after sink failure) must
    not change the table — the putItem/upsert contract that makes
    foreachBatch effectively exactly-once."""
    out = str(tmp_path / "t")
    sink = upsert_parquet(out, ["k"], order_col="v")
    sink(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), 0)
    before = {(r.k, r.v) for r in spark.read.parquet(out).select("k", "v").collect()}
    # replay epoch 0 with identical content
    sink(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), 0)
    after = {(r.k, r.v) for r in spark.read.parquet(out).select("k", "v").collect()}
    assert before == after == {("a", 1), ("b", 2)}
