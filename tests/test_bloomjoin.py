"""Bloom-filter semi-join pruning operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ice_spark.operators.bloomjoin import (
    bloom_filter_join,
    bloom_prefilter,
    build_bloom,
)


def test_no_false_negatives_and_exact_join(spark):
    fact = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 50).select(
        (F.col("id") * 7).alias("k"), F.lit("d").alias("tag")
    )
    got = bloom_filter_join(fact, dim, "k").select("k", "v", "tag")
    exact = fact.join(dim, "k").select("k", "v", "tag")
    assert sorted(got.collect()) == sorted(exact.collect())


def test_prefilter_keeps_all_members(spark):
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    bm = build_bloom(dim, "k", num_bits=1 << 14)
    kept = bloom_prefilter(dim, "k", bm, num_hashes=5).count()
    assert kept == 1000  # membership is never lost


def test_prefilter_prunes_most_non_members(spark):
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(100_000, 110_000).select(F.col("id").alias("k"))
    bm = build_bloom(dim, "k", num_bits=1 << 14)
    fp = bloom_prefilter(probe, "k", bm).count()
    # 100 keys in 16384 bits, 5 hashes -> fp rate well under 1%
    assert fp < 100


def test_null_keys_dropped_like_inner_join(spark):
    fact = spark.createDataFrame(
        [(None, 1), (1, 2), (2, 3)], "k long, v long"
    )
    dim = spark.createDataFrame([(1,)], "k long")
    got = bloom_filter_join(fact, dim, "k").select("k", "v").collect()
    assert [(r.k, r.v) for r in got] == [(1, 2)]


def test_outer_join_rejected(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="join type"):
        bloom_filter_join(df, df, "k", how="left_outer")


def test_probe_is_codegen_no_python(spark):
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    dim = spark.range(0, 10).select(F.col("id").alias("k"))
    plan = (
        bloom_filter_join(fact, dim, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan


def test_empty_dim_filters_everything(spark):
    fact = spark.range(10).select(F.col("id").alias("k"))
    dim = spark.range(0).select(F.col("id").alias("k"))
    assert bloom_filter_join(fact, dim, "k").count() == 0


def test_bloom_df_variant_matches_driver_variant(spark):
    """build_bloom_df/bloom_prefilter_df (the bitmap-as-DataFrame form
    g02 uses) must admit exactly the same rows as the driver-side
    build_bloom/bloom_prefilter on the same keys and parameters —
    same hash family, same bitmap, different delivery."""
    from ice_spark.operators.bloomjoin import (
        bloom_prefilter,
        bloom_prefilter_df,
        build_bloom,
        build_bloom_df,
    )

    dim = spark.range(0, 500, 3).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 4000).select(F.col("id").alias("k"))
    nb, nh = 1 << 12, 3
    bitmap = build_bloom(dim, "k", num_bits=nb, num_hashes=nh)
    bm_df = build_bloom_df(dim, "k", num_bits=nb, num_hashes=nh)
    # identical bitmaps
    assert bm_df.collect()[0]["__bloom_bm"] == bitmap
    a = sorted(
        r.k for r in bloom_prefilter(fact, "k", bitmap, num_hashes=nh).collect()
    )
    b = sorted(
        r.k
        for r in bloom_prefilter_df(fact, "k", bm_df, num_hashes=nh).collect()
    )
    assert a == b
    true_keys = {r.k for r in dim.collect()}
    assert true_keys <= set(a)  # no false negatives


def test_bloom_prefilter_df_is_codegen_bhj(spark):
    """The bitmap must arrive through a codegen'd BroadcastHashJoin —
    NOT a conditioned BroadcastNestedLoopJoin (interpreted per-row
    eval; +222s over 4.1e9 rows at g02's sf10 probe) and NOT a scalar
    subquery (bitmap re-shipped in every task closure)."""
    from ice_spark.operators.bloomjoin import bloom_prefilter_df, build_bloom_df

    dim = spark.range(10).select(F.col("id").alias("k"))
    fact = spark.range(100).select(F.col("id").alias("k"))
    bm_df = build_bloom_df(dim, "k", num_bits=1 << 10, num_hashes=3)
    plan = (
        bloom_prefilter_df(fact, "k", bm_df, num_hashes=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Subquery" not in plan
