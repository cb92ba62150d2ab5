"""Sequence packing: concatenate documents into fixed token-budget
context windows (the LM-pretraining "concat-and-chunk" packer).

Training pipelines concatenate tokenized documents per stream and cut
the stream every `budget` tokens; a document that straddles a cut is
split across two windows. The packing itself is embarrassingly
parallel ACROSS streams, so the scale design is: assign each document
to one of `shards` streams by key hash, order deterministically
within the stream, and pack each stream independently with a window
running-sum — one shuffle (the window partition), no global ordering
bottleneck. At 100 TB you raise `shards` to O(cores); each stream's
packing stays a per-partition sequential scan, which is exactly how
production packers (e.g. t5/gpt data pipelines) shard the problem.

Everything is a built-in expression: token counts, running sums and
bin arithmetic stay JVM-side; no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ice_spark.functions.text import token_count


def assign_bins(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    shards: int = 8,
) -> DataFrame:
    """Per-document packing assignment. Adds:

    - shard: the document's stream (pmod(id, shards) — deterministic,
      matches the oracle; a production run would hash)
    - n_toks: token count
    - end_pos: running token total within the shard (this doc's last
      token's 1-based position in the concatenated stream)
    - bin: index of the window containing the document's END
    - straddles: true iff the document crosses a window boundary
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks: Column = token_count(F.col(text_col))
    return (
        df.withColumn("shard", F.pmod(F.col(id_col), F.lit(shards)))
        .withColumn("n_toks", toks)
        .withColumn("end_pos", F.sum("n_toks").over(w))
        .withColumn(
            "bin", F.floor((F.col("end_pos") - F.lit(1)) / F.lit(budget)).cast("long")
        )
        .withColumn(
            "straddles",
            F.floor((F.col("end_pos") - F.col("n_toks")) / F.lit(budget))
            != F.col("bin"),
        )
    )


def packing_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    shards: int = 8,
) -> DataFrame:
    """Per-shard packing summary: docs, tokens, windows produced,
    boundary-straddling docs, and window utilization."""
    assigned = assign_bins(df, text_col, id_col, budget, shards)
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            (F.floor((F.max("end_pos") - F.lit(1)) / F.lit(budget)) + F.lit(1))
            .cast("long")
            .alias("n_bins"),
            F.sum(F.col("straddles").cast("long")).alias("n_straddlers"),
        )
        .withColumn(
            "utilization",
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("n_bins") * F.lit(budget)).cast("double"),
                4,
            ),
        )
    )
