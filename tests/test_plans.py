"""Physical-plan invariants — the scale contract, enforced.

These tests pin the plan shapes that make the engine viable at
100 TB: dimension joins must broadcast (no sort-merge join against a
bounded dim), selective scans must push filters into the parquet
reader, single-shuffle operators must stay single-shuffle. A future
change that silently regresses a plan fails here, not in production.
"""

from __future__ import annotations

import re

import pytest


def _plan(spark, sf_dir, name: str) -> str:
    from ice_spark.queries.registry import load_all

    df = load_all()[name].spark_fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q05_local_supplier_volume")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_selective_scan_pushes_filters(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q06_forecast_revenue")
    # plan toString truncates long filter lists — assert on the prefix
    m = re.search(r"PushedFilters: \[(\w+)", plan)
    assert m, plan
    assert "PushedFilters: []" not in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q06_forecast_revenue")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    # q06 needs exactly 4 lineitem columns
    assert all(len(s.split(",")) <= 4 for s in schemas), schemas


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("q01_pricing_summary", 1),  # one shuffle for the final agg
        ("e03_sessionization", 2),  # one shuffle by user + agg reuse
        ("e06_asof_click_before_purchase", 2),  # union+window asof: by key
    ],
)
def test_shuffle_budget(spark, sf_dir, name, max_exchanges):
    plan = _plan(spark, sf_dir, name)
    # count only real shuffles, not broadcast exchanges
    shuffles = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert shuffles <= max_exchanges, f"{name}: {shuffles} shuffles\n{plan[:2000]}"


def test_no_cartesian_products_in_headline(spark, sf_dir):
    for name in (
        "q01_pricing_summary",
        "q05_local_supplier_volume",
        "q18_large_volume_customer",
        "d04_minhash_lsh_pairs",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
