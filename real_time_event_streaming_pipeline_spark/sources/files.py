"""File-format connectors beyond parquet: CSV and JSON lines, with
explicit schemas (inference disabled — a schema-inference pass over
100 TB is a full extra scan).

The reference's only file-ish format is JSON-in-Kafka (S2); these
round out the batch ingestion surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC is self-describing (schema in the file footer like parquet)
    # and supports the same predicate pushdown / column pruning
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
