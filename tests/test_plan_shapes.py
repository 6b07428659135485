"""Physical-plan regression guards: the scale properties SCALING.md
documents must stay true as plans evolve. Reading the executed plan
string is crude but catches the regressions that matter (a dimension
join degrading to sort-merge+shuffle, a filter no longer reaching the
scan, a top-k becoming a global sort)."""

from __future__ import annotations

import pytest

from real_time_event_streaming_pipeline_spark.plans.citystream import q_events_by_city
from real_time_event_streaming_pipeline_spark.plans.relational import (
    q_cross_nation_volume,
    q_disjunctive_band_join,
    q_local_supplier_volume,
    q_market_share,
    q_pricing_summary,
    q_top_orders_per_customer,
    q_top_revenue_supplier,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dimension_joins_broadcast(spark, sf_med):
    plan = _plan(q_local_supplier_volume(spark, sf_med))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all sides dimension-sized here


def test_filters_push_to_scan(spark, sf_med):
    plan = _plan(q_pricing_summary(spark, sf_med))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_topk_is_take_ordered(spark, sf_med):
    plan = _plan(q_events_by_city(spark, sf_med))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_per_group_topk_prunes_before_shuffle(spark, sf_med):
    plan = _plan(q_top_orders_per_customer(spark, sf_med))
    assert "WindowGroupLimit" in plan


def test_cross_nation_dims_broadcast(spark, sf_med):
    # the only shuffle join allowed is the lineitem⋈orders fact chain
    plan = _plan(q_cross_nation_volume(spark, sf_med))
    assert plan.count("BroadcastHashJoin") >= 2  # supp_n, cust_n


def test_market_share_single_scan(spark, sf_med):
    # ratio-of-sums must not re-scan lineitem per term
    plan = _plan(q_market_share(spark, sf_med))
    assert len([l for l in plan.splitlines() if "lineitem" in l and "Scan" in l]) == 1


def test_top_revenue_supplier_view_computed_once(spark, sf_med):
    # Q15 shape: the revenue view feeds both the max and the equality
    # join; the scalar max arrives broadcast, not via re-aggregation
    # per row
    plan = _plan(q_top_revenue_supplier(spark, sf_med))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_disjunctive_band_join_single_lineitem_scan(spark, sf_med):
    plan = _plan(q_disjunctive_band_join(spark, sf_med))
    assert len([l for l in plan.splitlines() if "lineitem" in l and "Scan" in l]) == 1
    assert "BroadcastHashJoin" in plan


def test_nation_profit_dims_broadcast(spark, sf_med):
    # Q9 shape: part/supplier/nation broadcast; the only shuffle join
    # is lineitem⋈orders on orderkey
    from real_time_event_streaming_pipeline_spark.plans.tpch_extra import (
        q_nation_profit,
    )

    plan = _plan(q_nation_profit(spark, sf_med))
    assert plan.count("BroadcastHashJoin") >= 3


def test_supplier_part_cnt_anti_broadcast(spark, sf_med):
    # Q16 shape: the NOT IN is a broadcast anti-join, never a shuffle
    from real_time_event_streaming_pipeline_spark.plans.tpch_extra import (
        q_supplier_part_cnt,
    )

    plan = _plan(q_supplier_part_cnt(spark, sf_med))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_promo_revenue_single_scan_pushed(spark, sf_med):
    # Q14 shape: one lineitem scan with the month predicate pushed
    from real_time_event_streaming_pipeline_spark.plans.tpch_extra import (
        q_promo_revenue,
    )

    plan = _plan(q_promo_revenue(spark, sf_med))
    assert len([l for l in plan.splitlines() if "lineitem" in l and "Scan" in l]) == 1
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_large_volume_customer_topk(spark, sf_med):
    from real_time_event_streaming_pipeline_spark.plans.tpch_extra import (
        q_large_volume_customer,
    )

    plan = _plan(q_large_volume_customer(spark, sf_med))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_dominant_part_suppliers_semi(spark, sf_med):
    from real_time_event_streaming_pipeline_spark.plans.tpch_extra import (
        q_dominant_part_suppliers,
    )

    plan = _plan(q_dominant_part_suppliers(spark, sf_med))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_sliding_agg_single_shuffle(spark, sf_med):
    # window expansion happens inside the stage; exactly one exchange
    # (the final agg) plus none for the expand itself
    from real_time_event_streaming_pipeline_spark.plans.windowing import q_sliding_agg

    plan = _plan(q_sliding_agg(spark, sf_med))
    assert plan.count("Exchange hashpartitioning") == 1


def test_tfidf_diamond_and_no_term_window(spark, sf_med):
    """The tf→df diamond materializes tf once (lazy localCheckpoint):
    after one action both branches read Scan ExistingRDD and the text
    explode never re-runs. Document frequency must NOT be a window
    partitioned by term — that forces every row of a hot Zipf term
    into one sorted task; the only window allowed is the per-doc
    row_number (which gets WindowGroupLimit top-k pushdown)."""
    from real_time_event_streaming_pipeline_spark.plans.curation import q_tfidf

    df = q_tfidf(spark, sf_med)
    df.count()  # materialize the checkpoint
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_explodes = sum(1 for l in plan.splitlines() if "Generate explode" in l)
    assert n_explodes == 0, plan
    assert "ExistingRDD" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "doc_id" in line, line


def test_alert_followups_bucketed_equi_join(spark, sf_med):
    """The interval join must carry the time-bucket in the equi key
    (hash/sort-merge join keyed on (city, bkt)) — never a
    nested-loop over the 6-city key alone."""
    from real_time_event_streaming_pipeline_spark.plans.citystream import (
        q_alert_followups,
    )

    plan = _plan(q_alert_followups(spark, sf_med))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bkt" in plan


def test_round3_filter_family_plan_invariants(spark, sf_med):
    """Plan-shape guards for the round-3 additions: the chunker must
    stay shuffle-free (it rides the scan), CEP first-match and
    TS-similarity top-k must plan WindowGroupLimit (pre-shuffle group
    pruning), and none of the family may ever plan a cartesian
    product."""
    from real_time_event_streaming_pipeline_spark.plans.filters import (
        q_doc_chunking,
        q_fuzzy_linkage,
        q_gopher_rules,
    )
    from real_time_event_streaming_pipeline_spark.plans.windowing import (
        q_cep_pattern,
        q_ts_similarity,
    )

    chunk_plan = _plan(q_doc_chunking(spark, sf_med))
    assert "Exchange" not in chunk_plan, chunk_plan

    for fn in (q_gopher_rules, q_fuzzy_linkage, q_cep_pattern, q_ts_similarity):
        plan = _plan(fn(spark, sf_med))
        assert "CartesianProduct" not in plan, fn.__name__

    assert "WindowGroupLimit" in _plan(q_cep_pattern(spark, sf_med))
    assert "WindowGroupLimit" in _plan(q_ts_similarity(spark, sf_med))


def test_gemm_topk_plan_shape(spark, sf_med):
    """Round-4 blocked-GEMM top-k invariants: the scoring runs through
    ONE Arrow seam (FlatMapGroupsInPandas), a group-local
    WindowGroupLimit prunes candidates BEFORE the final per-query
    ranking exchange, and the corpus parquet is scanned exactly twice
    (corpus leg + query leg) — a third scan would mean the query
    replication re-reads the corpus."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import (
        q_cosine_topk,
        q_emb_ann_ivf,
    )

    for fn in (q_cosine_topk, q_emb_ann_ivf):
        plan = _plan(fn(spark, sf_med))
        assert plan.count("FlatMapGroupsInPandas") == 1, plan
        assert "WindowGroupLimit" in plan, plan
        scans = [
            l for l in plan.splitlines() if "embeddings" in l and "Scan" in l
        ]
        assert len(scans) == 2, plan


def test_image_dedup_decode_runs_once(spark, sf_med):
    """r7 perf fix guard: the banded self-join must read the
    checkpointed hash table on BOTH sides — if the localCheckpoint is
    dropped, each side re-runs the encode+decode mapInPandas lineage
    and the plan shows the Python decode stages again (the 2x decode
    that made this the slowest query in the r6 sweep)."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import (
        q_image_dedup_pairs,
    )

    plan = _plan(q_image_dedup_pairs(spark, sf_med))
    # the decode lineage is sealed behind the checkpoint barrier: the
    # join consumes an ExistingRDD scan, not MapInPandas stages
    assert "MapInPandas" not in plan, plan[:2000]
    assert "ExistingRDD" in plan


def test_merged_faces_keep_ideal_plans(spark, sf_med):
    """r7 registry-consolidation guard: the merged faces must not have
    bought their wider surface with plan regressions.
    - rel_grouping_sets (now the full 4-set lattice incl. rollup's):
      ONE Expand + ONE exchange — the whole lattice in a single
      shuffle pass, exactly as rollup/cube compile;
    - fn_math (now carrying the bitwise battery): zero exchanges —
      still a pure scan-side projection;
    - fn_array (now carrying posexplode): one Generate, zero
      exchanges — the lateral explode rides the scan."""
    from real_time_event_streaming_pipeline_spark.plans.relational import (
        q_grouping_sets,
    )
    from real_time_event_streaming_pipeline_spark.plans.scalar import (
        q_fn_array,
        q_fn_math,
    )

    gs = _plan(q_grouping_sets(spark, sf_med))
    assert gs.count("Expand") == 1
    assert gs.count("Exchange") == 1

    fm = _plan(q_fn_math(spark, sf_med))
    assert "Exchange" not in fm

    fa = _plan(q_fn_array(spark, sf_med))
    assert fa.count("Generate") == 1
    assert "Exchange" not in fa
