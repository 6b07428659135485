"""Synthetic CityStream event generator (reference S6 parity).

The reference producer emits one uniform-random event per 5 s over a
6-city × 4-type × 4-severity domain with templated descriptions
(producer/.../EventGeneratorService.java:23-53). This is the Spark-
native equivalent: a rate source mapped through deterministic
`value % N` domain projections — same domains, reproducible, and it
scales to any events/sec for load tests (the reference tops out at
0.2 ev/s).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import CITIES, SEVERITIES, _pick

EVENT_TYPES = ("traffic", "weather", "incident", "construction")

# Templates from EventGeneratorService.java:45-53.
DESCRIPTIONS = {
    "traffic": "traffic congestion detected",
    "weather": "weather condition reported",
    "incident": "incident reported, emergency services notified",
    "construction": "construction work in progress",
}


def _city_event_projection(rate: DataFrame) -> DataFrame:
    """Map a (timestamp, value) frame — rate source or range twin —
    onto the CityEvent shape. One definition so the streaming path and
    the batch ground-truth twin cannot drift."""
    v = F.col("value")
    city = _pick(CITIES, v)
    etype = _pick(EVENT_TYPES, F.floor(v / len(CITIES)).cast("long"))
    sev = _pick(SEVERITIES, F.floor(v / (len(CITIES) * len(EVENT_TYPES))).cast("long"))
    desc_map = F.create_map(
        *[x for t, d in DESCRIPTIONS.items() for x in (F.lit(t), F.lit(d))]
    )
    return rate.select(
        city.alias("city"),
        etype.alias("event_type"),
        sev.alias("severity"),
        F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
        F.concat_ws(" ", sev, desc_map[etype]).alias("description"),
        F.col("timestamp").alias("event_time"),
        v.alias("seq"),
    )


def city_event_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Streaming DataFrame with the reference CityEvent shape (city,
    event_type, severity, timestamp ISO-string, description) plus the
    typed event_time column our engine windows on."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value
    return _city_event_projection(rate)


def city_event_batch(spark: SparkSession, n: int = 1000) -> DataFrame:
    """Deterministic batch twin of the generator (spark.range) — used
    by tests to assert the domain mapping without a streaming trigger."""
    rate = spark.range(n).select(
        F.col("id").alias("value"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id") * 5)
        ).alias("timestamp"),
    )
    return _city_event_projection(rate)
