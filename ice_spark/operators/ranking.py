"""Exact global ranking / NTILE without a single-task sort.

Spark's `Window.orderBy(...)` with no PARTITION BY moves every row to
ONE task — the classic 100-TB scale-killer (WindowExec warns about it
at any size). The distributed-sort answer used here:

1. `repartitionByRange` on the ordering columns — Spark's range
   partitioner (sampled boundaries) gives partition i < partition j
   => every row in i sorts before every row in j;
2. per-partition local ranks via a window PARTITIONED by the range
   partition id (parallel, no single task);
3. per-partition row counts (a tiny relation) running-summed into
   global offsets, broadcast back;
4. global rank = offset + local rank. NTILE(t) is then pure integer
   arithmetic on the rank.

Sampling makes the partition BOUNDARIES nondeterministic, but the
ordering must be a total order (pass a unique tie-break column), so
the resulting ranks — and anything derived from them — are exact and
deterministic regardless of where the boundaries land.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_OFF = "__gr_off"
_N = "__gr_n"
_RANK = "__gr_rank"


def with_global_rank(df: DataFrame, order_cols: list[Column], out_col: str) -> DataFrame:
    """Add 1-based dense global row numbers along `order_cols` (must be
    a total order) plus the total count, scalably. Output columns:
    `out_col` (BIGINT rank) and `out_col + '_n'` (BIGINT total).

    The range-partitioned relation MUST be materialized once: the
    offsets pass and the rank pass both consume it, and an
    un-materialized RangePartitioner re-SAMPLES split boundaries on
    every re-execution — the two passes would disagree on which row
    lives in which partition and the global ranks silently corrupt
    (observed at sf0.1: 10 deciles collapsed to 5). localCheckpoint
    (not cache) is the right materialization: both consumers share ONE
    RDD (a cached plan is matched per-branch and leaks a CacheManager
    entry for the whole session), lineage is truncated so a stage
    retry can never re-sample boundaries (executor loss fails the job
    loudly instead of silently corrupting ranks), and the checkpoint
    blocks are freed by the ContextCleaner when the DataFrame goes out
    of scope — no unpersist bookkeeping. Cost class: a distributed
    sort's shuffle files, paid once (same as zipWithIndex on the RDD
    path)."""
    d = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = d.groupBy(_PID).agg(F.count(F.lit(1)).alias("__cnt"))
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        _PID,
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias(_OFF),
        F.sum("__cnt").over(w_all).alias(_N),
    )
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols))
    return (
        d.join(F.broadcast(offs), _PID)
        .withColumn(out_col, (F.col(_OFF) + local).cast("long"))
        .withColumn(out_col + "_n", F.col(_N).cast("long"))
        .drop(_PID, _OFF, _N)
    )


def ntile_from_rank(rank: Column, n: Column, tiles: int) -> Column:
    """SQL-standard NTILE(tiles) from a 1-based global rank and total
    count: the first (n mod tiles) tiles get ceil(n/tiles) rows. Pure
    integer arithmetic — engine-version-proof."""
    base = (n / tiles).cast("long")  # floor for non-negative
    s = n % tiles
    boundary = s * (base + 1)
    return (
        F.when(rank <= boundary, 1 + ((rank - 1) / (base + 1)).cast("long"))
        .otherwise(s + 1 + ((rank - boundary - 1) / F.nullif(base, F.lit(0))).cast("long"))
        .cast("long")
    )


def global_ntile(
    df: DataFrame, order_cols: list[Column], tiles: int, out_col: str
) -> DataFrame:
    """Add an exact NTILE(tiles) column along `order_cols` (total
    order required) without any unpartitioned window over the data."""
    r = with_global_rank(df, order_cols, _RANK)
    out = r.withColumn(
        out_col, ntile_from_rank(F.col(_RANK), F.col(_RANK + "_n"), tiles)
    )
    return out.drop(_RANK, _RANK + "_n")
