"""Streaming sinks: upsert-by-key foreachBatch (the DynamoDB putItem
replacement) and helpers.

The reference writes one DynamoDB putItem per row from a ForeachWriter
(consumer/.../SparkDynamoDBConsumer.java:202-283) — a new client per
partition per epoch, no batching (SURVEY.md §4.1 calls this an
anti-optimization). Our sink is foreachBatch writing columnar files
with last-writer-wins upsert semantics per key — identical observable
semantics (putItem = upsert by PK), bulk I/O.

Scale note: at 100 TB the store would be Delta/Iceberg MERGE INTO
partitioned by (date, city); this parquet rewrite keeps the same
upsert contract for the test image (no Delta jars) and documents the
swap point.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def upsert_parquet(
    out_dir: str,
    key_cols: list[str],
    order_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: merge the micro-batch into a parquet
    table, keeping one row per key — the row from the newest epoch
    (ties within a batch broken by order_col descending). Last writer
    wins, like the reference's putItem (SparkDynamoDBConsumer.java:264).
    """

    def write(batch: DataFrame, epoch_id: int) -> None:
        import shutil

        spark = batch.sparkSession
        bak = out_dir.rstrip("/") + ".bak"
        # crash recovery: a previous epoch may have died between the
        # two renames below — the live dir is missing but the backup
        # holds the full pre-swap table
        if not os.path.exists(out_dir) and os.path.exists(bak):
            os.rename(bak, out_dir)
        incoming = batch.withColumn("_epoch", F.lit(int(epoch_id)))
        if os.path.exists(out_dir):
            existing = spark.read.parquet(out_dir)
            merged = existing.unionByName(incoming)
        else:
            merged = incoming
        order = [F.desc("_epoch")] + ([F.desc(order_col)] if order_col else [])
        w = Window.partitionBy(*key_cols).orderBy(*order)
        deduped = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # write once to a staging dir (can't overwrite the dir being
        # read), then swap: rename the live dir ASIDE first so a full
        # table always exists on disk (old → .bak, tmp → live, drop
        # .bak). Not atomic — a concurrent reader can still catch the
        # instant between the two renames; true atomicity needs a
        # metastore/manifest commit (Delta/Iceberg), which is the
        # documented swap point at scale.
        tmp = out_dir.rstrip("/") + ".tmp"
        deduped.write.mode("overwrite").parquet(tmp)
        if os.path.exists(bak):
            shutil.rmtree(bak)
        if os.path.exists(out_dir):
            os.rename(out_dir, bak)
        os.rename(tmp, out_dir)
        if os.path.exists(bak):
            shutil.rmtree(bak)

    return write


def append_parquet(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch append sink (raw events / alerts, output mode
    append — reference Q1/Q3)."""

    def write(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    return write
