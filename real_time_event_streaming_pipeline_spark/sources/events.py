"""Event sources: batch parquet, streaming file source, Kafka.

Reference: Kafka source with earliest offsets + failOnDataLoss=false
(consumer/.../SparkDynamoDBConsumer.java:73-80) and JSON decode with a
fixed all-string schema (:85-88). Our production path mirrors it; the
test path substitutes the driver parquet tables through the same
plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import events_arrival_schema, load, normalize_events_ts, table_path

# Events schema with ts as an epoch-nanos long — used by tests that
# synthesize their own event files (nanos-long is the historical
# testdata format; normalize_events_ts converts it). The DRIVER
# testdata's arrival schema is probed per-file via
# catalog.events_arrival_schema, never assumed.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Reference CityEvent JSON schema — all strings, as the consumer
# declares it (SparkDynamoDBConsumer.java:65-70).
CITY_EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)


def events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


def events_file_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """The driver events table as a micro-batched file stream — the
    test-harness stand-in for Kafka; identical columns to
    events_batch so every plan runs unchanged.

    Spark's file stream source requires a *directory*, so the single
    parquet file is exposed through a symlinked staging dir. The dir is
    DETERMINISTIC per sf_dir: checkpoints record absolute file paths,
    so a restarted query must resolve the identical source location.

    The read schema is probed from the parquet footer
    (catalog.events_arrival_schema) and ts is derived through the SAME
    guard as the batch path (catalog.normalize_events_ts), so a
    testdata type change (nanos-long vs micros-timestamp) can never
    make stream and batch disagree."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(table_path(sf_dir, "events"), link)
    raw = (
        spark.readStream.schema(events_arrival_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )
    return normalize_events_ts(raw)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "city-events",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production source — byte-for-byte the reference's reader
    (SparkDynamoDBConsumer.java:73-88): Kafka → cast value to string →
    from_json with the fixed 5-string schema → flatten. Requires the
    spark-sql-kafka package on the classpath (not in the test image;
    plans are source-agnostic so tests use events_file_stream)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), CITY_EVENT_JSON_SCHEMA).alias("data")
    ).select("data.*")
