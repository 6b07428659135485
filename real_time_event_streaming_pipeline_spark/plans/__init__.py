"""Named query plans. Each submodule exposes QUERIES (name -> callable
(spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL twin).
``all_queries()`` / ``all_oracles()`` merge them for __spark_entry__."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    # hard imports: a broken module must fail the registry loudly, not
    # silently shrink the driver contract to whatever still imports
    from . import citystream, curation, llmdata, relational, scalar, tpch_extra, windowing

    # Order matters: the verify driver checks only the FIRST 50 registry
    # entries against the DuckDB oracle. Front-load the families that had
    # no hard correctness signal in round 1 (llm_* data-pipeline ops,
    # fn_* scalar families, windowing extensions) — 18+6+7+15 = 46 slots —
    # then citystream/relational/tpch_extra, which were all driver-green
    # in CORRECTNESS_r01.json and keep their local strict-oracle coverage
    # via tools/verify_local.py.
    return [llmdata, curation, windowing, scalar, citystream, relational, tpch_extra]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLE)
    return out
