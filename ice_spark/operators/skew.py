"""Skew mitigation: salted joins and heavy-key detection.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; salting is the explicit tool for the pathological case —
a handful of keys holding a large share of a 100 TB fact table, where
one shuffle partition would otherwise exceed executor memory.

Pattern: fact side gets a deterministic salt in [0, n); the dimension
side is replicated n times (one copy per salt value); join on
(key, salt). The shuffle spreads each hot key over n partitions at
the cost of n-fold dimension replication — only worth it for the
keys that are actually hot, hence `salted_join_hot_keys` salts ONLY
detected heavy hitters and joins the rest normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equivalent to fact.join(dim, on, how) with the shuffle spread
    over n_salts sub-partitions per key. Deterministic salt (stable
    hash of a row id), no RNG."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = fact.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    salted_dim = dim.crossJoin(F.broadcast(salts))
    out = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def heavy_keys(df: DataFrame, on: str, threshold_ratio: float = 0.01) -> DataFrame:
    """Keys holding more than threshold_ratio of all rows (the ones
    worth salting). One aggregation pass."""
    total = df.count()
    return (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > total * threshold_ratio)
        .select(on)
    )


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    threshold_ratio: float = 0.01,
) -> DataFrame:
    """Split-path join: detected hot keys take the salted route, the
    long tail joins normally; union of both. Dimension replication is
    paid only for the hot keys."""
    hot = heavy_keys(fact, on, threshold_ratio)
    fact_hot = fact.join(F.broadcast(hot), on, "left_semi")
    fact_cold = fact.join(F.broadcast(hot), on, "left_anti")
    dim_hot = dim.join(F.broadcast(hot), on, "left_semi")
    joined_hot = salted_join(fact_hot, dim_hot, on, n_salts)
    joined_cold = fact_cold.join(dim, on)
    return joined_hot.unionByName(joined_cold)


def skew_safe_count_distinct(df: DataFrame, key: str, col: str) -> DataFrame:
    """COUNT(DISTINCT col) GROUP BY key without a hot-key bottleneck.

    A plain count-distinct shuffles every value of a key into one
    partition (partial aggregation cannot compress distincts), so one
    hot key serializes on one executor. The two-stage form first
    distincts (key, col) pairs — that shuffle spreads by BOTH columns
    — then counts per key, where partial aggregation reduces to one
    long per key per partition. Identical results at any skew.
    """
    return (
        df.select(key, col)
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{col}"))
    )
