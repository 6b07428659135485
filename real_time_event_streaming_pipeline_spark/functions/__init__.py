"""Scalar derivation functions (CityStream parity layer).

The reference derives its columns in
consumer/.../SparkDynamoDBConsumer.java:
- ``event_id`` = concat(city,'-',event_type,'-',timestamp)   (:90-96)
- ``partition_key`` = concat(city,'#',event_type,'#',
  date_format(window.start, "yyyy-MM-dd'T'HH:mm:ss"))        (:133-139)
- ``ttl`` = epoch_now + 30 days                              (:259-262)

The driver test corpus has no city/severity columns, so we map the
synthetic ``events`` table onto the reference domains deterministically
(FIXTURES.md §A): ``user_id % 6`` → city, ``event_id % 4`` → severity.
All expressions are built-in Column functions — JVM-side, inside
whole-stage codegen; no Python UDFs on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CITIES = ("SF", "NYC", "LA", "Chicago", "Seattle", "Boston")
SEVERITIES = ("low", "medium", "high", "critical")
ALERT_SEVERITIES = ("high", "critical")
TTL_SECONDS = 30 * 24 * 3600  # reference: SparkDynamoDBConsumer.java:259-262

ISO_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss'Z'"
WINDOW_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
MICRO_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _pick(domain: tuple[str, ...], key: Column) -> Column:
    """domain[key % len(domain)] — deterministic small-domain mapping."""
    arr = F.array(*[F.lit(v) for v in domain])
    return F.element_at(arr, (key % len(domain)).cast("int") + 1)


def city_from_user(user_id: Column) -> Column:
    return _pick(CITIES, user_id)


def severity_from_event(event_id: Column) -> Column:
    return _pick(SEVERITIES, event_id)


def iso_ts(ts: Column) -> Column:
    """ISO-8601 'Z' string — reference keeps timestamps as such strings
    and relies on lexicographic == chronological order (SURVEY.md §1.3)."""
    return F.date_format(ts, ISO_FMT_SPARK)


def event_key(city: Column, event_type: Column, ts_iso: Column) -> Column:
    """Reference ``event_id`` recipe (SparkDynamoDBConsumer.java:90-96)."""
    return F.concat_ws("-", city, event_type, ts_iso)


def partition_key(city: Column, event_type: Column, window_start: Column) -> Column:
    """Reference recipe (SparkDynamoDBConsumer.java:133-139)."""
    return F.concat(
        city,
        F.lit("#"),
        event_type,
        F.lit("#"),
        F.date_format(window_start, "yyyy-MM-dd'T'HH:mm:ss"),
    )


def ttl_from(ts: Column) -> Column:
    """Reference TTL = now + 30d; deterministic variant anchors on event
    time instead of wall clock so the oracle can check it."""
    return (F.unix_timestamp(ts) + F.lit(TTL_SECONDS)).cast("long")
