"""Pandas-fetch gate over the formerly-HUGEINT-exposing queries.

The full pandas replica (tools/check_correctness_pandas.py) runs all
167 queries and belongs to the round-end trail; this test keeps the
20 queries that USED to expose HUGEINT columns — the exact round-5
driver-failure class — permanently green under the dtype-coercing
fetch path, so a regression (someone drops an exposure cast) fails in
CI rather than at the driver.
"""

from __future__ import annotations

import os

import duckdb
import pytest

FORMER_HUGEINT = [
    "e13_hourly_gap_fill_locf",
    "e14_windowed_dedup",
    "e16_hourly_linear_interp",
    "w06_value_window_functions",
    "w07_mom_revenue_growth",
    "w08_yoy_same_month",
    "w09_mom_contribution",
    "f06_conditional_null_handling",
    "f14_try_functions",
    "f15_map_functions",
    "g01_pagerank_order_network",
    "m04_audio_window_energy",
    "k04_kmv_audience_overlap",
    "k06_histogram_median",
    "k07_hll_distinct_users",
    "t08_unigram_logprob",
    "d10_duplicate_shingle_fraction",
    "t12_bpe_merge_pairs",
    "q12_priority_shipping",
]

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", FORMER_HUGEINT)
def test_pandas_fetch_hash_matches(spark, duck, name):
    import __spark_entry__ as ent
    from tools.check_correctness_pandas import frame_hash

    spark.catalog.clearCache()
    spdf = ent.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(ent.oracle_sql()[name]).df()
    sh, sn, scols = frame_hash(spdf)
    oh, on, ocols = frame_hash(odf)
    assert sorted(scols) == sorted(ocols)
    assert sn == on
    assert sh == oh, f"{name}: pandas-fetch hash diverged"
