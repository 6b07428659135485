"""Streaming extensions: observed metrics, custom stateful operator,
session windows, late-data metric surface."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.plans.citystream import (
    city_events,
    enrich_events,
)
from real_time_event_streaming_pipeline_spark.sources import events_file_stream
from real_time_event_streaming_pipeline_spark.streaming.metrics import (
    progress_metrics,
    with_observed_metrics,
)
from real_time_event_streaming_pipeline_spark.streaming.stateful import (
    running_user_profile,
)


def test_observed_metrics_and_progress(spark, sf_small, tmp_path):
    src = enrich_events(events_file_stream(spark, sf_small))
    observed = with_observed_metrics(src)
    q = (
        observed.writeStream.format("memory")
        .queryName("obs_smoke")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    m = progress_metrics(q)
    q.stop()
    assert m["observed"] is not None
    assert m["observed"]["rows"] > 0
    assert m["late_rows_dropped"] == 0  # stateless query drops nothing


def test_stateful_running_profile_matches_batch(spark, sf_small, tmp_path):
    """Final state after draining the stream == batch aggregation."""
    src = enrich_events(events_file_stream(spark, sf_small))
    q = (
        running_user_profile(src)
        .writeStream.format("memory")
        .queryName("user_profile")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # update mode emits one row per user per batch: take the latest per user
    got = (
        spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM user_profile) WHERE rn = 1"""
        )
        .collect()
    )
    batch = {
        r.user_id: (r.n, round(r.total, 4))
        for r in city_events(spark, sf_small)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert len(got) == len(batch)
    for r in got:
        n, total = batch[r.user_id]
        assert r.n_events == n
        assert abs(r.total_value - total) < 1e-6


def test_session_window_streaming(spark, sf_small, tmp_path):
    """session_window (streaming) session counts == batch lag/cumsum
    sessionization (rel_user_sessions semantics, 30-min gap)."""
    src = enrich_events(events_file_stream(spark, sf_small))
    sess = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT user_id, count(*) AS n_sessions FROM sessions_stream GROUP BY user_id")
        .collect()
    )
    from real_time_event_streaming_pipeline_spark.plans.relational import q_user_sessions

    want = {r.user_id: r.n_sessions for r in q_user_sessions(spark, sf_small).collect()}
    got_map = {r.user_id: r.n_sessions for r in got}
    # append mode only emits windows closed by the watermark; with a
    # bounded file stream the final watermark leaves the tail session
    # open per user — allow exactly that off-by-one-or-equal slack.
    assert set(got_map) <= set(want)
    for uid, n in got_map.items():
        assert n in (want[uid], want[uid] - 1), (uid, n, want[uid])


def test_transform_with_state_matches_batch(spark, sf_small, tmp_path):
    """Spark 4 transformWithStateInPandas: final running per-user
    profile == batch aggregation, bitwise (integer-cent state)."""
    import pytest

    from conftest import enable_vendored_protobuf

    # The TWS state server speaks protobuf; no installs allowed, but
    # the gcloud SDK on this image vendors a usable runtime — wire it
    # in (conftest.enable_vendored_protobuf). Still a loud skip on
    # images with neither.
    if not enable_vendored_protobuf():
        pytest.skip("no google.protobuf available; TWS needs its state protocol")

    from real_time_event_streaming_pipeline_spark.streaming.stateful import (
        running_user_counts_tws,
    )

    src = enrich_events(events_file_stream(spark, sf_small))
    q = (
        running_user_counts_tws(src)
        .writeStream.format("memory")
        .queryName("tws_profile")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM tws_profile) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in city_events(spark, sf_small)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
                / F.lit(100.0)
            ).alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_sliding_window_streaming_matches_batch(spark, sf_small, tmp_path):
    """Hopping window (15 min / 5 min) streamed in update mode: the
    final per-(window, event_type) counts equal the batch
    cs_sliding_agg result exactly (update mode re-emits corrected
    groups; latest emission per key wins)."""
    from real_time_event_streaming_pipeline_spark.plans.windowing import q_sliding_agg

    src = events_file_stream(spark, sf_small).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql(
            """SELECT window_start, event_type, max(n_events) AS n_events
               FROM sliding_stream GROUP BY window_start, event_type"""
        ).collect()
    }
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in q_sliding_agg(spark, sf_small).collect()
    }
    assert got == want


def test_statestore_reader_exposes_windowed_agg_state(spark, sf_small, tmp_path):
    """Operational surface: the Spark 4 state-store reader opens a
    query's checkpoint as a DataFrame — the debugging path for "what
    is this stream holding in state". Every surviving window must be
    within the watermark horizon of the stream's max event time, and
    every state key must be a (window, city, event_type) the batch
    twin actually produces."""
    from real_time_event_streaming_pipeline_spark.plans.citystream import (
        city_events,
        enrich_events,
        windowed_agg,
    )
    from real_time_event_streaming_pipeline_spark.sources import events_file_stream

    cp = str(tmp_path / "cp")
    q = (
        windowed_agg(enrich_events(events_file_stream(spark, sf_small)), watermark="10 minutes")
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .format("memory")
        .queryName("ss_reader_probe")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    state = spark.read.format("statestore").load(cp)
    rows = state.select(
        F.unix_micros("key.window.end").alias("w_end_us"),
        F.date_format("key.window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col("key.city").alias("city"),
        F.col("key.event_type").alias("event_type"),
    ).collect()
    assert rows, "state store empty — watermark evicted everything?"

    batch = city_events(spark, sf_small)
    max_ts_us = batch.agg(F.max(F.unix_micros("ts"))).first()[0]
    want_keys = {
        (r.window_start, r.city, r.event_type)
        for r in windowed_agg(batch).collect()
    }
    for r in rows:
        # eviction contract: state survives only while window.end is
        # above the watermark (max event time - 10 minutes)
        assert r.w_end_us > max_ts_us - 600_000_000
        assert (r.window_start, r.city, r.event_type) in want_keys


class _FakeGroupState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_profile_last_event_is_event_time_max_across_chunks(spark):
    """applyInPandasWithState delivers one group as SEVERAL pandas
    chunks when it spans Arrow batches: last_event_type must be the
    (ts, event_id)-max of the WHOLE group (and of prior batches),
    not of whichever chunk happened to arrive last."""
    import pandas as pd

    from real_time_event_streaming_pipeline_spark.streaming.stateful import (
        _update_user_profile,
    )

    chunk1 = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 10:00:05", "2024-01-01 10:00:09"]),
            "event_id": ["e1", "e9"],  # the true max lives in chunk 1
            "event_type": ["view", "purchase"],
            "value": [1.0, 2.0],
        }
    )
    chunk2 = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 10:00:07"]),
            "event_id": ["e7"],
            "event_type": ["click"],
            "value": [3.0],
        }
    )
    state = _FakeGroupState()
    (out,) = _update_user_profile((42,), [chunk1, chunk2], state)
    assert out["last_event_type"].iloc[0] == "purchase"
    assert out["n_events"].iloc[0] == 3

    # a LATER micro-batch carrying only older (late) events must not
    # overwrite the newer profile entry
    late = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 09:59:00"]),
            "event_id": ["e0"],
            "event_type": ["view"],
            "value": [4.0],
        }
    )
    (out2,) = _update_user_profile((42,), [late], state)
    assert out2["last_event_type"].iloc[0] == "purchase"
    assert out2["n_events"].iloc[0] == 4


def test_tws_counter_skips_null_values(spark):
    """A NULL value row must be SKIPPED by the cent accumulator, like
    the batch _exact_sum (F.floor(NULL) -> NULL -> F.sum skips) —
    floor(NaN).astype(int64) would otherwise inject INT64_MIN garbage
    into the running total with no error."""
    import pandas as pd

    from real_time_event_streaming_pipeline_spark.streaming.stateful import (
        _UserCounterProcessor,
    )

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    proc = _UserCounterProcessor()
    proc._st = _FakeValueState()
    pdf = pd.DataFrame({"value": [1.25, None, 2.5]})
    (out,) = proc.handleInputRows((7,), [pdf], None)
    assert out["n_events"].iloc[0] == 3  # count(*) counts the null row
    assert out["total_value"].iloc[0] == 3.75  # sum skips it
