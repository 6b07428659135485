"""Stream-stream and stream-static joins vs their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.catalog import load
from real_time_event_streaming_pipeline_spark.plans.citystream import (
    city_events,
    enrich_events,
)
from real_time_event_streaming_pipeline_spark.sources import events_file_stream
from real_time_event_streaming_pipeline_spark.streaming.joins import (
    purchases_after_views,
    stream_static_enrich,
)


def test_stream_static_enrich(spark, sf_small, tmp_path):
    """Stream enriched with a static dimension == batch left join."""
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(["click", "error", "purchase", "signup", "view"])],
        "event_type string, type_code int",
    )
    src = enrich_events(events_file_stream(spark, sf_small))
    q = (
        stream_static_enrich(src, dim, "event_type")
        .select("event_id", "type_code")
        .writeStream.format("memory")
        .queryName("enriched_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.event_id, r.type_code) for r in spark.sql("SELECT * FROM enriched_stream").collect()}
    want = {
        (r.event_id, r.type_code)
        for r in city_events(spark, sf_small).join(dim, "event_type", "left").select("event_id", "type_code").collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, sf_small, tmp_path):
    """Streaming purchases⋈views (30-min bound) == the equivalent
    batch range join."""
    src = enrich_events(events_file_stream(spark, sf_small))
    q = (
        purchases_after_views(src)
        .writeStream.format("memory")
        .queryName("pv_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.purchase_id, r.view_id, r.lag_seconds)
        for r in spark.sql("SELECT * FROM pv_join").collect()
    }

    ev = city_events(spark, sf_small)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    want = {
        (r.p_user, r.purchase_id, r.view_id, r.lag)
        for r in p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "p_user",
            "purchase_id",
            "view_id",
            (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")).cast("long").alias("lag"),
        )
        .collect()
    }
    assert got
    assert got == want


def test_stream_stream_left_outer_join(spark, sf_small, tmp_path):
    """left_outer stream-stream join: matched rows == the inner join;
    null-view rows are exactly purchases with no qualifying view whose
    match window the final watermark closed (tail purchases may stay
    unemitted — subset check on that side)."""
    src = enrich_events(events_file_stream(spark, sf_small))
    q = (
        purchases_after_views(src, how="left_outer")
        .writeStream.format("memory")
        .queryName("pv_left")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got_matched = {
        (r.user_id, r.purchase_id, r.view_id)
        for r in spark.sql(
            "SELECT * FROM pv_left WHERE view_id IS NOT NULL"
        ).collect()
    }
    got_unmatched = {
        r.purchase_id
        for r in spark.sql("SELECT * FROM pv_left WHERE view_id IS NULL").collect()
    }

    ev = city_events(spark, sf_small)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left",
    )
    want_matched = {
        (r.p_user, r.purchase_id, r.view_id)
        for r in joined.filter(F.col("view_id").isNotNull()).collect()
    }
    want_unmatched = {
        r.purchase_id for r in joined.filter(F.col("view_id").isNull()).collect()
    }
    assert got_matched == want_matched
    assert got_unmatched <= want_unmatched
    assert got_unmatched  # the watermark did close and emit some


def test_stream_stream_full_outer_join(spark, sf_small, tmp_path):
    """full_outer stream-stream join (Spark 3.1+ with event-time
    bounds on both sides): matched rows == the inner join; null-view
    rows are purchases the closing watermark proved view-less;
    null-purchase rows are views no qualifying purchase followed.
    Both unmatched sides are emitted only when the watermark closes
    their window, so tails may stay unemitted — subset checks there."""
    src = enrich_events(events_file_stream(spark, sf_small))
    joined = purchases_after_views(src, how="full_outer")
    q = (
        joined.writeStream.format("memory")
        .queryName("pv_full")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got_matched = {
        (r.user_id, r.purchase_id, r.view_id)
        for r in spark.sql(
            "SELECT * FROM pv_full WHERE view_id IS NOT NULL AND purchase_id IS NOT NULL"
        ).collect()
    }
    got_viewless = {
        r.purchase_id
        for r in spark.sql(
            "SELECT * FROM pv_full WHERE view_id IS NULL AND purchase_id IS NOT NULL"
        ).collect()
    }
    got_purchaseless = {
        r.view_id
        for r in spark.sql(
            "SELECT * FROM pv_full WHERE purchase_id IS NULL AND view_id IS NOT NULL"
        ).collect()
    }

    ev = city_events(spark, sf_small)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = p.join(
        v,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "full_outer",
    )
    want_matched = {
        (r.p_user, r.purchase_id, r.view_id)
        for r in batch.filter(
            F.col("view_id").isNotNull() & F.col("purchase_id").isNotNull()
        ).collect()
    }
    want_viewless = {
        r.purchase_id
        for r in batch.filter(F.col("view_id").isNull()).collect()
    }
    want_purchaseless = {
        r.view_id
        for r in batch.filter(F.col("purchase_id").isNull()).collect()
    }
    assert got_matched == want_matched
    assert got_viewless <= want_viewless
    assert got_purchaseless <= want_purchaseless
    assert got_viewless and got_purchaseless  # both outer sides emitted
    # the user is known on BOTH outer sides (p_user coalesces with
    # v_user): full_outer must never emit user_id NULL
    assert spark.sql(
        "SELECT count(*) c FROM pv_full WHERE user_id IS NULL"
    ).first().c == 0
