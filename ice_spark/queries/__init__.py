"""Query library: every entry is a (Spark DataFrame fn, DuckDB oracle SQL) pair.

The registry in ``ice_spark.queries.registry`` is consumed by
``__spark_entry__.py`` (the driver contract) and by ``bench.py``.
"""

from ice_spark.queries.registry import QUERIES, QuerySpec, register  # noqa: F401
