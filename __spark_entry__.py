"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine code lives in ``real_time_event_streaming_pipeline_spark/``;
query registry in ``real_time_event_streaming_pipeline_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_event_streaming_pipeline_spark.plans import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    centerpiece 5-minute tumbling windowed aggregation
    (SparkDynamoDBConsumer.java:120-147) in batch form."""
    from real_time_event_streaming_pipeline_spark.plans.citystream import q_windowed_agg

    return q_windowed_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys without one get a rows-only check."""
    return all_oracles()
