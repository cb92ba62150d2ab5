"""Streaming upsert sink — apply a change stream to a catalog table.

The reference's watch loop only appends whole files
(InsertWatch.java:71-238). A training-data pipeline also needs the
CDC shape: a stream of keyed records (re-crawled pages, re-scored
docs) where the LATEST version per key must win. Spark-native
expression: Structured Streaming source → foreachBatch → per-batch
last-wins dedup → copy-on-write merge (catalog/merge.merge_upsert),
which prunes untouched files via manifest column bounds.

Exactly-once: the checkpoint tracks consumed source files; each
micro-batch commits one atomic `overwrite` snapshot. Re-running a
failed batch re-applies the same merge — idempotent because merge by
key is."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ice_spark.catalog.merge import merge_upsert
from ice_spark.catalog.table import Table


def upsert_watch(
    table: Table,
    directory: str,
    key_cols: list[str],
    order_col: str | None = None,
    fire_once: bool = False,
    checkpoint: str | None = None,
    timeout_sec: float | None = None,
) -> dict:
    """Merge every parquet file appearing in `directory` into `table`
    keyed on `key_cols`; within a micro-batch the row with the
    highest `order_col` (or an arbitrary one if None) wins per key."""
    spark = table.spark
    checkpoint = checkpoint or os.path.join(
        tempfile.gettempdir(), f"ice_spark_upsert_{abs(hash(table.location))}"
    )
    summaries: list[dict] = []

    stream = (
        spark.readStream.schema(table.schema)
        .option("maxFilesPerTrigger", 100)
        .parquet(directory)
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        src = batch_df
        if order_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
            src = (
                src.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            src = src.dropDuplicates(key_cols)
        summaries.append(merge_upsert(table, src, key_cols))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if fire_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(timeout_sec)
        q.stop()
    else:
        q = writer.start()
        if timeout_sec is not None:
            q.awaitTermination(timeout_sec)
            q.stop()
    return {
        "batches": len(summaries),
        "rows_merged": sum(s.get("source_rows", 0) for s in summaries),
        "checkpoint": checkpoint,
    }
