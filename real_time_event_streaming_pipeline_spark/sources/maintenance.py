"""Table-maintenance operators for file-based sinks.

Streaming appends (streaming/sinks.append_parquet — one directory of
files per micro-batch) accumulate small files; at 100 TB the scan
cost of a table is dominated by file count long before data volume
(driver-side listing, one task per tiny split, per-file footer
reads). Compaction is the standing maintenance job every
file-backed sink needs — the Delta/Iceberg OPTIMIZE analogue,
expressed over plain parquet directories.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(spark: SparkSession, path: str) -> dict:
    """(n_files, total_bytes) for a parquet directory tree — the
    decision input for compact_parquet (driver-side listing only)."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return {"n_files": n, "total_bytes": total}


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into ~target_bytes files.

    File count = ceil(total_bytes / target_bytes) on the *compressed*
    size — the right granularity for scan parallelism. Optional
    sort_cols cluster rows inside the rewrite (repartitionByRange +
    sortWithinPartitions) so min/max row-group stats become selective
    — the poor man's Z-order, one dimension at a time. The rewrite is
    atomic-by-rename: write to a staging dir, then swap, so a reader
    never sees a half-compacted table. On object stores the swap
    point is a metastore/manifest update instead (Delta/Iceberg
    OPTIMIZE); the dataflow is identical.
    """
    stats = table_file_stats(spark, path)
    n_out = max(1, math.ceil(stats["total_bytes"] / target_bytes))
    df: DataFrame = spark.read.parquet(path)
    staging = path.rstrip("/") + "._compacting"
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(staging)
    old = path.rstrip("/") + "._old"
    os.rename(path, old)
    os.rename(staging, path)
    import shutil

    shutil.rmtree(old)
    after = table_file_stats(spark, path)
    return {"before": stats, "after": after, "target_files": n_out}
