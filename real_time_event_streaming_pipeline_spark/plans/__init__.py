"""Named query plans. Each submodule exposes QUERIES (name -> callable
(spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL twin).
``all_queries()`` / ``all_oracles()`` merge them for __spark_entry__."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    # hard imports: a broken module must fail the registry loudly, not
    # silently shrink the driver contract to whatever still imports
    from . import (
        citystream,
        curation,
        filters,
        llmdata,
        relational,
        scalar,
        tpch_extra,
        windowing,
    )

    return [llmdata, curation, filters, windowing, scalar, citystream, relational, tpch_extra]


# The verify driver checks only the FIRST 50 registry entries against
# the DuckDB oracle each round (r1 covered cs_*/rel_*, r2 covered
# llm_*/fn_*/windowing). Round 3 front-loads (a) the 10 queries that
# were never inside a driver window in r1+r2 and (b) the 5 queries the
# r2 driver marked red, whose output shapes were hardened this round —
# so by r3 every registered query has at least one driver verdict and
# every fix gets driver confirmation. Everything else keeps module
# order and its local strict-oracle coverage via tools/verify_local.py.
_PRIORITY_R3 = (
    # never in a driver window across r1+r2 (VERDICT r2, missing #1)
    "fn_percentiles",
    "fn_unpivot",
    "fn_array",
    "fn_posexplode",
    "rel_sql_subqueries",
    "cs_kafka_producer_frame",
    "cs_producer_metrics",
    "cs_alert_followups",
    "rel_large_volume_customer",
    "rel_dominant_part_suppliers",
    # driver-red in CORRECTNESS_r02, output shapes hardened this round
    "llm_emb_quantize",
    "llm_corpus_pipeline",
    "llm_token_rarity",
    "llm_seq_packing",
    "fn_variant",
    # new in round 3 — no driver verdict yet
    "llm_gopher_rules",
    "llm_char_entropy",
    "llm_doc_chunking",
    "llm_corpus_stats_cube",
    "llm_dsir_weights",
    "llm_length_outliers",
    "llm_pack_materialize",
    "llm_dup_span_removal",
    "llm_emb_ann_pq",
    "llm_knn_classify",
    "llm_bigram_logprob",
    "llm_fuzzy_linkage",
    "rel_lateral_topk",
    "fn_url",
    "rel_event_transitions",
    "rel_funnel_conversion",
    "rel_value_outliers",
    "rel_cep_pattern",
    "rel_ts_similarity",
    "rel_retention_cohorts",
)


def _reorder(merged: dict) -> dict:
    out = {k: merged[k] for k in _PRIORITY_R3 if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        merged.update(m.QUERIES)
    return _reorder(merged)


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for m in _modules():
        merged.update(m.ORACLE)
    return _reorder(merged)
