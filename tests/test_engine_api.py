"""CityStreamEngine facade: parameterized endpoint behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.engine import CityStreamEngine
from real_time_event_streaming_pipeline_spark.functions import CITIES


@pytest.fixture(scope="module")
def eng(spark, sf_small):
    return CityStreamEngine(spark, sf_small)


def test_events_parameterized(eng):
    rows = eng.events("Boston", limit=7).collect()
    assert 0 < len(rows) <= 7
    assert all(r.city == "Boston" for r in rows)
    times = [r.event_time for r in rows]
    assert times == sorted(times, reverse=True)


def test_summary_total_consistent(eng):
    rows = {r.event_type: r.total_events for r in eng.summary("LA").collect()}
    total = rows.pop("__TOTAL__")
    assert total == sum(rows.values()) and total > 0


def test_alerts_city_and_hours(eng):
    rows = eng.alerts(city="SF", hours=24, limit=10).collect()
    assert all(r.city == "SF" and r.severity in ("high", "critical") for r in rows)
    all_cities = eng.alerts(hours=1_000_000).collect()  # unbounded window
    assert {r.city for r in all_cities} <= set(CITIES)


def test_cities_ranked(eng):
    rows = eng.cities().collect()
    assert [r.city for r in rows] and len(rows) == 6
    counts = [r.total_events for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_aggregations_filtered(eng):
    rows = eng.aggregations("NYC", "view", limit=5).collect()
    assert 0 < len(rows) <= 5
    assert all(r.city == "NYC" and r.event_type == "view" for r in rows)


def test_stats_and_metrics(eng):
    stats = {r.metric: r.value for r in eng.stats().collect()}
    assert stats["total_events"] > 0
    assert "alerts_high" in stats and "alerts_critical" in stats
    m = eng.producer_metrics().first()
    assert m.events_total == stats["total_events"]
    assert m.events_per_sec > 0


def test_corpus_engine_surface(spark, sf_small):
    """CorpusEngine: every method returns a sane DataFrame; dedup
    keeps exactly one representative per near-dup cluster."""
    from real_time_event_streaming_pipeline_spark.corpus import CorpusEngine

    corp = CorpusEngine(spark, sf_small)
    assert corp.quality().count() == corp._docs().count()
    sp = corp.split().groupBy("split").count().collect()
    assert {r.split for r in sp} == {"train", "val", "test"}
    n_sample = corp.sample(rate_per_mille=100).count()
    assert 0 < n_sample < corp._docs().count()

    pairs = corp.near_duplicates(threshold=0.5)
    kept = corp.dedup(threshold=0.5)
    n_docs = corp._docs().count()
    # every pair lost at least one member; kept + losers = all docs
    from real_time_event_streaming_pipeline_spark.operators.clustering import (
        connected_components,
    )

    cc = connected_components(pairs)
    n_losers = cc.filter("vertex != component").count()
    assert kept.count() == n_docs - n_losers
    # no surviving near-dup pair within the kept set
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    for r in pairs.collect():
        assert not (r.a_id in kept_ids and r.b_id in kept_ids)

    nb = corp.neighbors(k=3, n_queries=2)
    assert nb.groupBy("q_id").count().agg({"count": "max"}).first()[0] == 3

    # round-2 surface: PII scrub keeps schema + row count (clean corpus
    # → text unchanged, zero counts); keywords/rarity/quantize are keyed
    # per doc / per vector
    scrubbed = corp.scrub_pii()
    assert scrubbed.count() == n_docs
    assert scrubbed.agg(F.sum("n_email")).first()[0] == 0
    kw = corp.keywords(top_k=2)
    assert kw.groupBy("doc_id").count().agg({"count": "max"}).first()[0] == 2
    assert corp.token_rarity().count() == n_docs
    qz = corp.quantized_embeddings()
    assert qz.count() == corp._emb().count()


def test_corpus_engine_round3_surface(spark, sf_small):
    """Round-3 CorpusEngine methods: semantic dedup keep/drop covers
    every vector, span removal keys per doc, outlier gate carries the
    corpus stats, packing layout and materialization agree on shard
    token totals."""
    from real_time_event_streaming_pipeline_spark.corpus import CorpusEngine

    corp = CorpusEngine(spark, sf_small)
    n_docs = corp._docs().count()
    n_vecs = corp._emb().count()

    sem = corp.dedup_semantic()
    assert sem.count() == n_vecs
    assert sem.filter("keep").count() >= 1

    spans = corp.remove_duplicate_spans()
    assert spans.count() == n_docs

    lo = corp.length_outliers()
    assert lo.count() == n_docs
    assert lo.select("med").distinct().count() == 1

    layout = corp.pack_sequences()
    packs = corp.pack_sequences(materialize=True)
    t1 = layout.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
    t2 = packs.groupBy("shard").agg(F.sum("pack_tokens").alias("t")).collect()
    assert {(r.shard, r.t) for r in t1} == {(r.shard, r.t) for r in t2}


def test_corpus_engine_filter_wave_surface(spark, sf_small):
    """Round-3 filter-wave CorpusEngine methods: the gate flags a
    nonempty pass subset, entropy/LM scores cover every doc, chunks
    cover every doc's tokens, the cube's grand total matches, knn
    classifies every held-out query, and fuzzy_links returns the
    verified pair set."""
    from real_time_event_streaming_pipeline_spark.corpus import CorpusEngine

    corp = CorpusEngine(spark, sf_small)
    n_docs = corp._docs().count()

    g = corp.gate()
    assert g.count() == n_docs
    assert 0 < g.filter("passes").count() < n_docs

    assert corp.char_entropy().count() == n_docs
    assert corp.lm_score(order=1).count() == n_docs
    assert corp.lm_score(order=2).count() == n_docs
    assert corp.importance_weights().count() == n_docs

    ch = corp.chunks()
    assert ch.select("doc_id").distinct().count() == n_docs

    cube = corp.stats_cube()
    total = cube.filter("g_lang = 1 AND g_source = 1").collect()
    assert len(total) == 1 and total[0].n_docs == n_docs

    knn = corp.classify_knn()
    n_queries = corp._emb().filter("vec_id % 20 = 0").count()
    assert knn.count() == n_queries

    fl = corp.fuzzy_links()
    assert fl.filter("dist > 1").count() == 0

    import pytest

    with pytest.raises(ValueError):
        corp.lm_score(order=3)


def test_corpus_engine_tokenizer_surface(spark, sf_small):
    """Round-6 CorpusEngine tokenizer methods: training returns a
    ranked merge table; tokenize under an explicit table matches
    tokenize under the self-trained default; token counts bound words
    (every word is >= 1 token, + its end-of-word marker)."""
    from real_time_event_streaming_pipeline_spark.corpus import CorpusEngine

    corp = CorpusEngine(spark, sf_small)
    merges = corp.train_tokenizer(num_merges=4)
    assert [m[0] for m in merges] == [1, 2, 3, 4]
    assert all(m[3] > 0 for m in merges)
    enc = corp.tokenize(merges).orderBy("doc_id")
    enc_default = corp.tokenize(num_merges=4).orderBy("doc_id")
    rows, rows_d = enc.collect(), enc_default.collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows_d]
    for r in rows:
        assert r.n_bpe_tokens >= r.n_words  # >= one token per word
        assert r.head_tokens
