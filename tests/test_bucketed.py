"""Bucketed co-located joins: zero shuffle Exchanges on either side,
results identical to the plain join."""

from __future__ import annotations

import pytest

from ice_spark.operators.bucketed import colocated_join, exchange_count, write_bucketed
from ice_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo"))
    write_bucketed(li, "b_lineitem", "l_orderkey", 8, path=str(tmp_path / "bl"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the assertion tests bucketing, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        joined.write.format("noop").mode("overwrite").save()  # materialize
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert exchange_count(joined) == 0, "bucketed join must not shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    plain = load_table(spark, SF, "orders").join(
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "orders").o_orderkey
        == load_table(spark, SF, "lineitem").l_orderkey,
    )
    assert joined.count() == plain.count()


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join on raw parquet needs Exchanges (when the
    # small side is too big to broadcast, forced here via hint removal
    # and a no-broadcast threshold)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF, "orders")
        li = load_table(spark, SF, "lineitem")
        j = orders.join(li, orders.o_orderkey == li.l_orderkey)
        j.write.format("noop").mode("overwrite").save()
        assert exchange_count(j) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
