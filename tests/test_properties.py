"""Property-based checks (hypothesis) for the engine's determinism
invariants. Few examples, tiny data — each example is a Spark job."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.plans.citystream import (
    enrich_events,
    windowed_agg,
)
from real_time_event_streaming_pipeline_spark.plans.relational import _exact_sum

MONEY = st.decimals(
    min_value="-99999.99", max_value="99999.99", places=2
).map(float)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(MONEY, min_size=1, max_size=40), parts=st.integers(1, 8))
@settings(**_SETTINGS)
def test_exact_sum_partitioning_invariant(spark, vals, parts):
    """_exact_sum must not depend on row order or partition count, and
    must equal the decimal-exact sum of 2-decimal inputs."""
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(parts)
    got = df.agg(_exact_sum(F.col("x"), 2).alias("s")).first().s
    want = round(sum(round(v * 100) for v in vals)) / 100.0
    assert got == pytest.approx(want, abs=0)


@given(
    offsets=st.lists(st.integers(0, 86_400), min_size=1, max_size=30, unique=True)
)
@settings(**_SETTINGS)
def test_window_bucket_assignment(spark, offsets):
    """Every event lands in exactly the floor(epoch/300)*300 bucket and
    total counts are preserved (no event lost or duplicated)."""
    base = int(datetime(2024, 3, 1, tzinfo=timezone.utc).timestamp())
    rows = [
        (i, datetime.fromtimestamp(base + o, tz=timezone.utc).replace(tzinfo=None), i, "view", 1.0, "{}")
        for i, o in enumerate(offsets)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    agg = windowed_agg(enrich_events(df)).collect()
    assert sum(r.event_count for r in agg) == len(offsets)
    starts = {r.window_start for r in agg}
    want = {
        datetime.fromtimestamp((base + o) // 300 * 300, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        for o in offsets
    }
    assert starts == want
