"""Regenerate the physical-plan trees quoted in PLANS.md.

Usage: python tools/dump_plans.py [sf_dir]  (default /root/testdata/sf0.1)
Prints the formatted plan of each headline shape; paste the trees into
PLANS.md when a plan legitimately changes (the plan-shape tests in
tests/test_plan_shapes.py decide what counts as a regression).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from real_time_event_streaming_pipeline_spark.plans import all_queries  # noqa: E402
from real_time_event_streaming_pipeline_spark.session import get_spark  # noqa: E402

SHAPES = [
    "rel_pricing_summary",
    "rel_shipping_priority",
    "cs_sliding_agg",
    "rel_nation_profit",
    "llm_dedup_ngram_jaccard",
    "llm_emb_cosine_topk",
    "cs_alert_followups",
    "llm_tfidf",
    "llm_semdedup",
    "llm_dup_span_removal",
    "llm_bpe_encode",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    qs = all_queries()
    for name in SHAPES:
        df = qs[name](spark, sf_dir)
        print(f"##### {name} #####")
        print(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )


if __name__ == "__main__":
    main()
