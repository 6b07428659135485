"""Live pipeline metrics (reference A7: producer running counters,
KafkaProducerService.java:35-40,90-145 and GET /metrics/producer).

Two complementary mechanisms, both zero-cost to the data path:
- ``df.observe()`` — accumulator-style aggregates riding on each
  micro-batch (no extra pass, no shuffle);
- ``StreamingQueryProgress`` — engine-maintained counters, including
  ``numRowsDroppedByWatermark`` (reference W8: late rows are silently
  dropped; we surface them as a metric instead).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OBSERVATION_NAME = "pipeline_metrics"


def with_observed_metrics(df: DataFrame, name: str = OBSERVATION_NAME) -> DataFrame:
    """Attach per-micro-batch observed metrics: row count, value sum,
    event-time span — the streaming twin of cs_producer_metrics."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / F.lit(100.0)).alias(
            "value_sum"
        ),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )


def progress_metrics(query) -> dict[str, Any]:
    """Normalized snapshot of a StreamingQuery's last progress."""
    p = query.lastProgress
    if p is None:
        return {}
    state = p.get("stateOperators") or []
    observed = (p.get("observedMetrics") or {}).get(OBSERVATION_NAME)
    return {
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),
        "rows_per_second": p.get("processedRowsPerSecond"),
        "late_rows_dropped": sum(s.get("numRowsDroppedByWatermark", 0) for s in state),
        "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
        "observed": dict(observed.asDict()) if observed is not None else None,
    }
