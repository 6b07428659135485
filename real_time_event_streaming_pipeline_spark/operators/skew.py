"""Skew mitigation: salted two-phase aggregation and salted join.

At 100 TB a handful of hot keys (one city producing 50% of events, a
crawl domain with 10^9 documents) turn a shuffle into one straggler
task. AQE's skew-join splitting handles joins; for aggregations with
algebraic functions the classic fix is salting: shuffle once on
(key, salt) to spread the hot key over N reducers, then once more on
key to combine the partials — both shuffles are balanced.

Only algebraic aggregates decompose this way (count → sum of counts,
sum → sum, min/max → min/max); holistic ones (exact median,
collect_list order) do not — that's why the API takes explicit
partial/final specs instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: list[Column],
    finals: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (keys + random salt) then (keys).

    partials: aggregate expressions for phase 1, each aliased.
    finals:   aggregate expressions over the phase-1 columns, aliased
              with the output names.

    Example — skew-proof count+sum:
        salted_agg(df, ["city"],
                   [F.count("*").alias("_n"), F.sum("value").alias("_s")],
                   [F.sum("_n").alias("n"), F.sum("_s").alias("value_sum")])
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_count_sum(
    df: DataFrame, keys: list[str], value_col: str | None = None, n_salts: int = 16
) -> DataFrame:
    """Convenience: skew-proof count (+ optional exact-unit value sum)."""
    partials = [F.count("*").alias("_n")]
    finals = [F.sum("_n").alias("n")]
    if value_col:
        e2 = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
        partials.append(F.sum(e2).alias("_s"))
        finals.append((F.sum("_s") / F.lit(100.0)).alias(f"{value_col}_sum"))
    return salted_agg(df, keys, partials, finals, n_salts)
