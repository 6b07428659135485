"""IVF ANN recall and the DLQ parse path."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.catalog import load
from real_time_event_streaming_pipeline_spark.operators import similarity as S
from real_time_event_streaming_pipeline_spark.plans.native import (
    parse_city_events_with_dlq,
)


def test_ivf_ann_beats_random(spark, sf_small):
    emb = load(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {(r.q_id, r.n_id) for r in S.brute_force_topk(emb, queries, k=5).collect()}
    ivf = {(r.q_id, r.n_id) for r in S.ivf_ann_topk(emb, queries, k=5).collect()}
    n = emb.count()
    overlap = len(bf & ivf) / len(bf)
    assert overlap > 10 * (5.0 / n), (overlap, 5.0 / n)
    # probing 4/16 cells must score far fewer candidates than brute force
    assert len(ivf) == len(bf)


def test_parse_with_dlq_splits(spark):
    df = spark.createDataFrame(
        [
            ('{"city":"SF","event_type":"traffic","severity":"low",'
             '"timestamp":"2024-01-01T00:00:00Z","description":"d"}',),
            ("garbage",),
            ('{"event_type":"weather"}',),  # parses but no city -> dlq
        ],
        "value string",
    )
    good, dlq = parse_city_events_with_dlq(df)
    assert good.count() == 1 and good.first().city == "SF"
    rejects = {r.raw for r in dlq.collect()}
    assert rejects == {"garbage", '{"event_type":"weather"}'}
