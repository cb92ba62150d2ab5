"""Bucketed (co-located) table writes for shuffle-free joins.

At 100 TB the dominant cost of a fact-to-fact join is shuffling both
sides on the key. Spark's bucketing amortizes that: write each table
ONCE hash-bucketed (and sorted) on its join key, and every subsequent
join on that key reads co-located buckets — a sort-merge join with
ZERO Exchange on either side. The reference has no join surface at
all (SURVEY.md §2.8); this is the Spark-native answer to "join two
100 TB tables repeatedly without paying the shuffle every time".

Rules Spark enforces (and these helpers encode):
- both sides bucketed on their join column with the same bucket count
  (or a divisor — Spark 3.1+ coalesces bucket counts);
- `spark.sql.sources.bucketing.enabled` on (default);
- sortBy at write time removes even the per-bucket sort at read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Persist `df` as a bucketed managed/external table and return a
    DataFrame over it. Bucket metadata lives in the session catalog —
    on a cluster use a shared metastore so every job sees it."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    spark = df.sparkSession
    return spark.table(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys. With matching
    bucket layouts Catalyst plans this without any Exchange."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan —
    the invariant bucketed joins are meant to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
