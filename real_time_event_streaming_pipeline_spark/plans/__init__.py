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

    return [citystream, relational, tpch_extra, llmdata, curation, scalar, windowing]


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
