"""Physical-plan regression guards: the scale properties SCALING.md
documents must stay true as plans evolve. Reading the executed plan
string is crude but catches the regressions that matter (a dimension
join degrading to sort-merge+shuffle, a filter no longer reaching the
scan, a top-k becoming a global sort)."""

from __future__ import annotations

import pytest

from real_time_event_streaming_pipeline_spark.plans.citystream import q_events_by_city
from real_time_event_streaming_pipeline_spark.plans.relational import (
    q_local_supplier_volume,
    q_pricing_summary,
    q_top_orders_per_customer,
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
