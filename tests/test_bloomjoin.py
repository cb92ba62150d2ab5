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
