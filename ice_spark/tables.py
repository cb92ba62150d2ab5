"""Loaders for the driver-generated TPC-H-ish parquet tables.

Tables (see TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table in
``$SPARK_GRAFT_SF_DIR``.

All loads are plain ``spark.read.parquet`` so Catalyst owns predicate
pushdown, column pruning and partition sizing. ``load_tables`` also
registers temp views so ``spark.sql`` queries work unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (id(session), sf_dir, name) -> (session, DataFrame). Each
# spark.read.parquet call re-infers the schema from the file footer
# (~50-150 ms of py4j + IO); the testdata is immutable, so reuse the
# DataFrame. Holding the session ref keeps id() collision-free; a
# stopped session invalidates its entries.
_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), os.path.realpath(sf_dir), name)
    hit = _CACHE.get(key)
    if hit is not None:
        try:
            alive = hit[0].sparkContext._jsc is not None
        except Exception:
            alive = False
        if alive:
            return hit[1]
        del _CACHE[key]
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects unless it may read it as a raw long. Set the legacy
        # conf here (runtime-settable) so the engine also works on a
        # caller-provided SparkSession (e.g. the driver harness), then
        # truncate to micros with exact integer division (the value
        # exceeds 2^53, so float division would corrupt it).
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    _CACHE[key] = (spark, df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
