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


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Bucketed table layout: rows are hash-clustered AND sorted by the
    join key at write time, so later equi-joins between tables bucketed
    on the same key run with NO shuffle and NO sort — the write pays
    once what every join would otherwise pay (the 100 TB answer for
    repeated orderkey joins; see SCALING.md roadmap)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
