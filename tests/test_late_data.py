"""W8: late-data handling — rows behind the watermark are dropped from
the windowed aggregation and surfaced via the drop metric."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.plans.citystream import (
    enrich_events,
    windowed_agg,
)
from real_time_event_streaming_pipeline_spark.catalog import normalize_events_ts
from real_time_event_streaming_pipeline_spark.sources.events import EVENTS_SCHEMA


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        [(i, int(ts * 1e9), u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    stage = str(tmp_path / "stream_in")
    os.makedirs(stage)
    # batch 0: fresh events at T+2h
    _write_batch(spark, stage + "/b=0", [(1, base + 7200, 1, "view"), (2, base + 7205, 1, "view")])

    agg = windowed_agg(
        enrich_events(
            normalize_events_ts(
                spark.readStream.schema(EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", 100)
                .parquet(stage + "/b=*")
            )
        ),
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_agg")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    # batch 1: a straggler 2 hours older than everything seen — far
    # behind watermark (T+2h − 10min) → must be dropped
    _write_batch(spark, stage + "/b=1", [(3, base, 2, "error")])
    q.processAllAvailable()
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0) for s in (q.lastProgress or {}).get("stateOperators", [])
    )
    q.stop()

    got = spark.sql("SELECT * FROM late_agg").collect()
    assert sum(r.event_count for r in got) == 2  # straggler absent
    assert not any(r.window_start.startswith("2024-01-01 00:00") for r in got)
    assert dropped >= 1
