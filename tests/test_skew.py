"""Salted joins must be result-equivalent to plain joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from ice_spark.operators.skew import heavy_keys, salted_join, salted_join_hot_keys
from ice_spark.tables import load_table


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equivalence(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", n_salts=8)
    assert _norm(plain) == _norm(salted)


def test_hot_key_split_join_equivalence(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_acctbal"
    )
    # every supplier key is hot at this ratio (10 suppliers)
    hot = heavy_keys(li, "l_suppkey", threshold_ratio=0.01)
    assert hot.count() > 0
    plain = li.join(supp, "l_suppkey")
    split = salted_join_hot_keys(li, supp, "l_suppkey", n_salts=4, threshold_ratio=0.01)
    assert _norm(plain) == _norm(split)
