"""Streaming deduplication — online exact dedup for ingest pipelines.

At 100 TB/day you dedup AT INGEST, not in nightly batches. Two modes:

- dedup_stream: Spark's built-in stateful dropDuplicates on a
  fingerprint column, optionally bounded by a watermark
  (dropDuplicatesWithinWatermark) so state doesn't grow unboundedly —
  the right default when near-duplicates arrive close in time.
- The fingerprint is the portable polynomial hash
  (functions.text.char_hash) so the same identity is used by the
  batch dedup operators — a doc deduped online won't reappear in the
  batch pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ice_spark.functions.text import char_hash_arrow


def with_fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    return df.withColumn(out_col, char_hash_arrow(F.col(text_col)))


def dedup_stream(
    stream: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate documents from a stream by content fingerprint.

    With ts_col, state is bounded by the watermark (duplicates farther
    apart than the watermark may both pass — the batch pass catches
    them). Without, state grows with distinct fingerprints (exact, for
    bounded streams/tests).
    """
    fp = with_fingerprint(stream, text_col)
    if ts_col is not None:
        return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return fp.dropDuplicates(["fingerprint"])


def _list_epoch_dirs(spark, index_dir: str, exclude: str | None = None) -> list[str]:
    """Enumerate `epoch=*` subdirectories of index_dir through the
    Hadoop FileSystem API — NOT os.listdir, which only sees the
    driver-local filesystem. For a remote index_dir (s3a://, hdfs://,
    abfs://) os.listdir/os.path.isdir would return nothing, the gate
    would be silently built against an EMPTY index, and duplicates
    would be permanently admitted — the exact failure the gate exists
    to prevent. Hadoop FS resolves any configured scheme, including
    bare local paths. A real IO error (permissions, transient network)
    raises and fails the batch, which the checkpoint then retries.
    """
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("epoch=") and name != exclude:
            out.append(st.getPath().toString())
    return sorted(out)


def span_admission_stream(
    stream: DataFrame,
    dest_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    reject_bp: int = 5000,
    seed_corpus: DataFrame | None = None,
    trigger_available_now: bool = True,
):
    """Streaming span-level admission (d20's stream form): each
    micro-batch is gated against a PERSISTED span-hash index
    (operators/dedup.span_index layout, one `__h` bigint column),
    admitted docs land in `dest_dir`, and their spans GROW the index
    — so batch N+1 is gated against everything admitted through
    batch N, the continuously-ingesting-pipeline semantics d20
    simulates in batch.

    Exactly-once across foreachBatch replays: both the admitted docs
    and the index growth are written to epoch-keyed subdirectories
    with mode("overwrite") — a replayed epoch overwrites its own
    output instead of appending duplicates (the crash-window rule
    streaming/watch.py follows).

    `seed_corpus`: optional standing corpus whose index is written as
    epoch `seed` before the stream starts (yesterday's corpus).
    Returns the started StreamingQuery.

    Scale shape: identical to the batch gate — the index side of the
    membership join grows with the corpus and is merge-pinned inside
    span_admission_against_index; the per-epoch index write adds one
    distinct over BATCH spans only.
    """
    import os

    from ice_spark.operators.dedup import (
        span_admission_against_index,
        span_index,
    )

    spark = stream.sparkSession
    if seed_corpus is not None:
        span_index(seed_corpus, text_col, w).write.mode("overwrite").parquet(
            os.path.join(index_dir, "epoch=seed")
        )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        # Enumerate prior epoch directories explicitly: "no index yet"
        # means the directory listing is empty, NOT that a read threw.
        # A transient IO error / corrupt shard must fail the batch (the
        # checkpoint retries it) — swallowing it would silently disable
        # the dedup gate and let duplicates permanently into dest_dir.
        prior = _list_epoch_dirs(sess, index_dir, exclude=f"epoch={epoch_id}")
        if prior:
            idx = sess.read.parquet(*prior)
        else:
            idx = sess.createDataFrame([], "`__h` long")
        decisions = span_admission_against_index(
            idx, batch_df, id_col=id_col, text_col=text_col, w=w, reject_bp=reject_bp
        )
        admitted = batch_df.join(
            decisions.where(F.col("admitted")).select(id_col), id_col, "semi"
        )
        # epoch-keyed overwrite: replays are idempotent
        epoch_path = os.path.join(dest_dir, f"epoch={epoch_id}")
        admitted.write.mode("overwrite").parquet(epoch_path)
        # Grow the index from the parquet just written, not the live
        # plan: avoids re-running the whole gate (explode + merge join)
        # a second time and is stable under speculative re-execution.
        span_index(sess.read.parquet(epoch_path), text_col, w).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, f"epoch={epoch_id}"))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
