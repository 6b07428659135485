"""PySpark-native analytics engine with the query and data-processing
capabilities of rishaliype/Real-Time-Event-Streaming-Pipeline
("CityStream"), re-expressed Spark-first (see SURVEY.md).

Layout:
- ``session``    — scale-tuned SparkSession factory
- ``catalog``    — parquet table registry over a scale-factor dir
- ``functions``  — scalar derivations (CityStream domain mapping)
- ``plans``      — named batch query plans + DuckDB oracle twins
- ``operators``  — extension operators (dedup, similarity, text, topk…)
- ``sources``    — batch/streaming source abstraction
- ``streaming``  — Structured Streaming pipeline (the reference's 4
  concurrent queries, watermark/update/append/complete modes)
"""

from .catalog import load, register_all, TABLES
from .session import get_spark

__all__ = ["get_spark", "load", "register_all", "TABLES"]
