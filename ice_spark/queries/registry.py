"""Central query registry.

Each query is registered once with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (idiomatic
  DataFrame API — Catalyst owns the physical plan), and
- an optional DuckDB oracle SQL string over the pre-registered views
  ``region nation customer supplier part orders lineitem events
  documents embeddings``. Queries whose semantics aren't
  SQL-expressible (hash-seeded LSH variants, streaming) omit the
  oracle and get the driver's weaker rows-only check.

Cross-engine determinism conventions (why results hash-match):
- Money sums go through exact decimal arithmetic:
  ``SUM(CAST(x AS DECIMAL(18,2)))`` is order-insensitive and
  bit-identical across engines; the result is cast back to DOUBLE so
  schemas agree. Per-row double products (e.g. price*(1-disc)) are
  IEEE-deterministic, then cast to decimal before the sum.
- Averages = exact decimal sum cast to double, divided by COUNT —
  all deterministic double ops.
- LIMIT/top-k queries always have a total order (explicit
  tie-breaker columns).
- Timestamps are emitted as DATE or STRING, never raw timestamps.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclasses.dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL, None => rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a Spark query with its DuckDB oracle."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run."""
    # Imports are lazy so a syntax error in one module is visible, not
    # silently skipped.
    from ice_spark.queries import analytics  # noqa: F401
    from ice_spark.queries import events  # noqa: F401
    from ice_spark.queries import functions_lib  # noqa: F401
    from ice_spark.queries import graph  # noqa: F401
    from ice_spark.queries import joins  # noqa: F401
    from ice_spark.queries import multimodal  # noqa: F401
    from ice_spark.queries import quality  # noqa: F401
    from ice_spark.queries import sketches  # noqa: F401
    from ice_spark.queries import text  # noqa: F401
    from ice_spark.queries import tpch  # noqa: F401
    from ice_spark.queries import vectors  # noqa: F401

    return QUERIES
