"""Bucketed join layout: co-located joins skip the shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.catalog import load
from real_time_event_streaming_pipeline_spark.streaming.batch_sink import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_small, tmp_path):
    # (warehouse dir is a static conf — managed tables land in the
    # session default and are dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        write_bucketed(load(spark, sf_small, "orders"), "orders_b", "o_orderkey")
        write_bucketed(
            load(spark, sf_small, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            "o_orderkey",
        )
        joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # buckets align: no shuffle

        # and the join result is still correct
        want = (
            load(spark, sf_small, "lineitem")
            .join(load(spark, sf_small, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
