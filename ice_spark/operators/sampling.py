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


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    heldout_buckets: int = 1000,
) -> DataFrame:
    """Leakage-safe split report over a near-dup pair graph — the
    shared tail of s11 (pairs from d02's inverted shingle index) and
    s13 (pairs from d04's banded MinHash-LSH): connected components
    over `pairs`, split assigned ATOMICALLY per cluster by hashing the
    component representative (so a doc and its near-duplicates can
    never straddle train/heldout), plus an in-query audit that zero
    clusters span splits.

    Which pair source to feed it is a measured regime choice (PERF.md
    r8): the inverted-index route (s11) is right for boilerplate-light
    corpora; for duplication-heavy corpora whose dup groups approach
    DEFAULT_MAX_POSTING the posting cap would zero its recall, and the
    banded-LSH route (s13) is the 100 TB composition (sf5: 60.5s full
    recall vs 356.8s on a capped-out index).

    Scale shape: the split adds one hash + one left join over the
    component map to the clustering cost; singleton docs never enter
    the pair graph; the report is O(#splits) rows.
    """
    from ice_spark.operators.cluster import alternating_star_components

    comp = alternating_star_components(pairs, pair_a, pair_b).select(
        F.col("node").alias("c_doc"), F.col("component").alias("rep0")
    )
    allc = (
        docs.select(id_col)
        .join(comp, F.col(id_col) == F.col("c_doc"), "left")
        .select(id_col, F.coalesce(F.col("rep0"), F.col(id_col)).alias("rep"))
    )
    sp = allc.select(
        id_col,
        "rep",
        F.when(hash_bucket(F.col("rep")) < heldout_buckets, F.lit("heldout"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    leaky = (
        sp.groupBy("rep")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_leaky_clusters")
        )
    )
    return (
        sp.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("rep").alias("n_clusters"),
        )
        .crossJoin(leaky)
        .select("split", "n_docs", "n_clusters", "n_leaky_clusters")
        .orderBy("split")
    )
