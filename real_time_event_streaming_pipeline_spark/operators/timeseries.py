"""Sequential time-series recurrences — the honest applyInPandas
case: an EWMA's output depends on the previous *output*, which no
composition of built-in window/agg expressions can express (windows
combine inputs, not running results). Everything else in this engine
stays JVM-side; this is the documented escape hatch (Arrow-batched,
one group per user, deterministic float recurrence). Deterministic
enough, in fact, to be bitwise oracle-checked: the DuckDB twin
replays the same IEEE fold per ordered prefix via list_reduce
(plans/windowing._REL_EWMA_SQL).

Scale shape: one shuffle on the group key; per-group state is the
single running value, memory O(group rows) only within the Arrow
batch. Skewed users would be chunked by (user, day) with carry-in
state at the seam.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def ewma_by_key(
    df: DataFrame,
    alpha: float = 0.2,
    key: str = "user_id",
    ts: str = "ts",
    order2: str = "event_id",
    val: str = "value",
) -> DataFrame:
    """Per-key exponentially weighted moving average ordered by
    (ts, order2): y_t = (1-α)·y_{t-1} + α·x_t, y_0 = x_0
    (pandas ewm(adjust=False) semantics). Deterministic: a pure float
    recurrence over a totally ordered group."""
    out_schema = f"{key} long, {order2} long, {val} double, ewma double"

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, order2])
        e = pdf[val].ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {
                key: pdf[key],
                order2: pdf[order2],
                val: pdf[val],
                "ewma": e.round(6),
            }
        )

    return df.select(key, ts, order2, val).groupBy(key).applyInPandas(f, out_schema)
