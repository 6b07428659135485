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


def test_compact_parquet(spark, sf_small, tmp_path):
    """Compaction: a fragmented table (64 tiny files) rewrites into
    the byte-targeted file count with identical contents; sort_cols
    cluster rows so row-group min/max stats become selective."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.sources.maintenance import (
        compact_parquet,
        table_file_stats,
    )

    p = str(tmp_path / "frag")
    ev = load(spark, sf_small, "events")
    ev.repartition(64).write.mode("overwrite").parquet(p)
    assert table_file_stats(spark, p)["n_files"] == 64
    before = {tuple(r) for r in spark.read.parquet(p).collect()}

    total = table_file_stats(spark, p)["total_bytes"]
    report = compact_parquet(spark, p, target_bytes=total // 3, sort_cols=["ts"])
    assert report["after"]["n_files"] == report["target_files"] <= 4
    after = {tuple(r) for r in spark.read.parquet(p).collect()}
    assert after == before
    # clustering check: each output file's ts range is disjoint-ish —
    # every file covers < the full span (range partitioning by ts)
    import pyspark.sql.functions as SF

    per_file = (
        spark.read.parquet(p)
        .groupBy(SF.input_file_name().alias("f"))
        .agg(SF.min("ts").alias("lo"), SF.max("ts").alias("hi"))
        .collect()
    )
    assert len(per_file) == report["after"]["n_files"]
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # range-partitioned: files don't interleave


def test_foreach_row_sink_lifecycle(spark, sf_small, tmp_path):
    """S3 in the reference's own row-at-a-time shape: ForeachWriter
    open/process/close, one keyed upsert per row, last writer wins at
    read time — final state equals the bulk foreachBatch sink's."""
    from real_time_event_streaming_pipeline_spark.plans.citystream import enrich_events
    from real_time_event_streaming_pipeline_spark.sources import events_file_stream
    from real_time_event_streaming_pipeline_spark.streaming.sinks import (
        RowUpsertWriter,
        read_row_upserts,
    )

    out = str(tmp_path / "rows")
    src = enrich_events(events_file_stream(spark, sf_small)).select(
        "event_id", "city", "severity", "ts_iso"
    )
    q = (
        src.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .foreach(RowUpsertWriter(out, ["event_id"]))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    state = read_row_upserts(out)
    from real_time_event_streaming_pipeline_spark.plans.citystream import city_events

    want = {
        (r.event_id,): (r.city, r.severity)
        for r in city_events(spark, sf_small).collect()
    }
    assert len(state) == len(want)
    for k, row in state.items():
        assert (row["city"], row["severity"]) == want[k]
    # crash artifacts never surface: a stray .inprogress file is ignored
    import pathlib

    pathlib.Path(out, "part-99999-epoch-0000000000.jsonl.inprogress").write_text("junk")
    assert read_row_upserts(out) == state


def test_python_datasource_batch_matches_generator(spark):
    """The custom `cityevents` Python DataSource (Spark 4 DataSource
    API) must be bit-identical to the spark.range generator twin after
    the shared CityEvent projection, and generation must be
    partition-parallel."""
    from real_time_event_streaming_pipeline_spark.sources.generator import (
        _city_event_projection,
        city_event_batch,
    )
    from real_time_event_streaming_pipeline_spark.sources.pydatasource import (
        CityEventDataSource,
    )

    spark.dataSource.register(CityEventDataSource)
    raw = spark.read.format("cityevents").option("n", 200).option("num_partitions", 4).load()
    assert raw.rdd.getNumPartitions() == 4
    got = {tuple(r) for r in _city_event_projection(raw).collect()}
    want = {tuple(r) for r in city_event_batch(spark, 200).collect()}
    assert got == want


def test_python_datasource_stream_drains_deterministically(spark, tmp_path):
    """The streaming side: a bounded offset cursor drains to max_value
    through micro-batches and the union of all batches equals the
    batch read — the Kafka-style replayable-offset contract."""
    from real_time_event_streaming_pipeline_spark.sources.generator import (
        _city_event_projection,
        city_event_batch,
    )
    from real_time_event_streaming_pipeline_spark.sources.pydatasource import (
        CityEventDataSource,
    )

    spark.dataSource.register(CityEventDataSource)
    stream = (
        spark.readStream.format("cityevents")
        .option("rows_per_batch", 64)
        .option("max_value", 150)
        .load()
    )
    q = (
        _city_event_projection(stream)
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM pyds_stream").collect()}
    want = {tuple(r) for r in city_event_batch(spark, 150).collect()}
    assert got == want


def test_file_stream_matches_batch_at_source(spark, sf_small, tmp_path):
    """Source-level stream==batch guard (not through any pipeline): a
    drained events_file_stream must deliver exactly the rows and ts
    values of the batch events table, whatever parquet type the
    driver's testdata ships ts as. A future testdata format change
    fails HERE first."""
    from real_time_event_streaming_pipeline_spark.sources.events import (
        events_batch,
        events_file_stream,
    )

    batch = events_batch(spark, sf_small).select("event_id", "ts", "user_id")
    stream = events_file_stream(spark, sf_small, max_files_per_trigger=100).select(
        "event_id", "ts", "user_id"
    )
    assert stream.schema == batch.schema
    q = (
        stream.writeStream.format("memory")
        .queryName("src_equiv")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM src_equiv").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want
