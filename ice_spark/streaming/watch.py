"""Directory-watch streaming ingest.

The reference's only streaming operator is `insert --watch <sqs>` —
an SQS poll loop over S3 ObjectCreated events that appends new files
with --no-copy --skip-duplicates (idempotent at-least-once;
/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/cmd/InsertWatch.java:71-238).

Spark-native re-expression: Structured Streaming file source →
foreachBatch append into the catalog table, with checkpointing for
exactly-once batch tracking. `--watch-fire-once` (test mode,
InsertWatch.java) maps to Trigger.AvailableNow. The SQS transport is
infrastructure, not engine semantics; the file-notification source
covers the same contract (new files appear → they are appended once).
"""

from __future__ import annotations

import os
import tempfile

from ice_spark.catalog.table import Table
from ice_spark.ingest.insert import append_dataframe


def watch(
    table: Table,
    directory: str,
    fire_once: bool = False,
    checkpoint: str | None = None,
    compression: str = "gzip",
    timeout_sec: float | None = None,
) -> dict:
    """Stream-append every parquet file that appears in `directory`.

    Exactly-once: the checkpoint tracks which source files each batch
    consumed; our snapshot commit is atomic per batch.
    """
    spark = table.spark
    checkpoint = checkpoint or os.path.join(
        tempfile.gettempdir(), f"ice_spark_watch_{abs(hash(table.location))}"
    )
    batches: list[int] = []

    stream = (
        spark.readStream.schema(table.schema)
        .option("maxFilesPerTrigger", 100)  # SQS drain cap analog (<=100 msgs)
        .parquet(directory)
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_dataframe(table, batch_df, compression=compression)
        batches.append(batch_id)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if fire_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        q.awaitTermination(timeout_sec)
        q.stop()
    return {"batches": len(batches), "checkpoint": checkpoint}
