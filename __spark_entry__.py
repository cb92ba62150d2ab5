"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1 pricing summary) at sf0.001.
queries()       — every implemented query from SURVEY.md §2 +
                  beyond-reference operators (ice_spark.queries).
oracle_sql()    — DuckDB-equivalent SQL per query; every registered
                  query currently carries one (index builds like IVF
                  k-means and PQ codebooks are replayed in SQL too).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ice_spark.queries.registry import load_all

    q = load_all()["q01_pricing_summary"]
    return q.spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ice_spark.queries.registry import load_all

    return {name: spec.spark_fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from ice_spark.queries.registry import load_all

    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
