"""Connector round-trips and partition-pruning layout."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_event_streaming_pipeline_spark.catalog import load
from real_time_event_streaming_pipeline_spark.plans.citystream import city_events
from real_time_event_streaming_pipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)
from real_time_event_streaming_pipeline_spark.streaming.batch_sink import (
    read_partitioned,
    write_partitioned,
)

SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_acctbal", T.DoubleType()),
    ]
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_csv_roundtrip(spark, sf_small, tmp_path):
    src = load(spark, sf_small, "customer").select("c_custkey", "c_name", "c_acctbal")
    p = str(tmp_path / "c_csv")
    write_csv(src, p)
    assert _rows(read_csv(spark, p, SCHEMA)) == _rows(src)


def test_jsonl_roundtrip(spark, sf_small, tmp_path):
    src = load(spark, sf_small, "customer").select("c_custkey", "c_name", "c_acctbal")
    p = str(tmp_path / "c_json")
    write_jsonl(src, p)
    assert _rows(read_jsonl(spark, p, SCHEMA)) == _rows(src)


def test_orc_roundtrip_with_pushdown(spark, sf_small, tmp_path):
    src = load(spark, sf_small, "customer").select("c_custkey", "c_name", "c_acctbal")
    p = str(tmp_path / "c_orc")
    write_orc(src, p)
    back = read_orc(spark, p)
    assert _rows(back) == _rows(src)
    plan = (
        back.filter(F.col("c_custkey") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,7)]" in plan


def test_partitioned_write_prunes(spark, sf_small, tmp_path):
    ce = city_events(spark, sf_small).select("event_id", "city", "event_type", "value")
    p = str(tmp_path / "by_city")
    write_partitioned(ce, p, ["city"])
    back = read_partitioned(spark, p)
    assert back.count() == ce.count()

    one = back.filter(F.col("city") == "SF")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "city" in plan.split("PartitionFilters")[1][:120]
    assert one.count() == ce.filter(F.col("city") == "SF").count()


def test_schema_evolution_merge(spark, tmp_path):
    """Reading a table whose files were written under an evolving
    schema: mergeSchema unions the footers; rows from old files read
    NULL for later-added columns (100 TB reality — schemas drift and
    a reader must not require a rewrite)."""
    p = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.mode("overwrite").parquet(p + "/v=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("overwrite").parquet(p + "/v=2")
    df = spark.read.option("mergeSchema", "true").parquet(p + "/v=*")
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
