"""Batch table writer with the layout the 100 TB deployment needs:
hive-style partitioning so key-equality queries prune at the file
level — the Spark replacement for the reference's DynamoDB hash-key
Query (api/.../CityStreamApiApplication.java:156-167; SURVEY.md §1.5:
"partition key" → partition columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Partitioned parquet: one directory level per partition column.
    A filter on a partition column then reads only matching dirs
    (PartitionFilters in the scan, zero data files touched for other
    keys)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
