"""Reproducible sampling for training-data pipelines.

Random sampling (`df.sample`) isn't reproducible across engines,
partitionings, or retries. Deterministic hash-bucket sampling is:
a row is in the p% sample iff ``portable_hash(key) mod M < p*M``.
Properties that matter at 100 TB:

- re-running (or re-sharding) yields the SAME sample — retries and
  incremental runs stay consistent;
- the complement is exactly the remaining rows — train/heldout splits
  never overlap;
- works identically in any engine that can compute the hash (the
  DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ice_spark.functions.text import char_hash

BUCKETS = 10_000


def hash_bucket(key: Column) -> Column:
    """Stable bucket in [0, BUCKETS) from any key column (stringified)."""
    return char_hash(key.cast("string")) % BUCKETS


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic `fraction` sample keyed on key_col."""
    return df.where(hash_bucket(F.col(key_col)) < int(fraction * BUCKETS))


def train_heldout_split(
    df: DataFrame, key_col: str, heldout_fraction: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible split."""
    cut = int(heldout_fraction * BUCKETS)
    b = hash_bucket(F.col(key_col))
    return df.where(b >= cut), df.where(b < cut)


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages). Strata missing from `fractions` are kept whole."""
    b = hash_bucket(F.col(key_col))
    cond = F.lit(True)
    expr = None
    for stratum, frac in fractions.items():
        clause = (F.col(strata_col) == stratum) & (b >= int(frac * BUCKETS))
        expr = clause if expr is None else (expr | clause)
    if expr is None:
        return df
    return df.where(~expr)
