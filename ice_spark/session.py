"""SparkSession factory tuned for the ice_spark engine.

Design point: a 1000-executor cluster reading ~100 TB. The settings
below are safe on ``local[*]`` for tests but chosen for scale:

- AQE on (runtime coalescing of shuffle partitions, skew-join
  splitting, dynamic join-strategy downgrade to broadcast).
- ``spark.sql.shuffle.partitions`` defaults high-ish and lets AQE
  coalesce down; at cluster scale you want an initial value of
  2-3x total cores and AQE trims the rest.
- Arrow enabled so Pandas-UDF paths (the only Python hot paths we
  allow) move data in columnar batches, not pickled rows.
- ``maxPartitionBytes`` at 128 MiB keeps scan partitions
  executor-memory friendly at 100 TB (≈ 800k scan tasks, which a
  1000-executor cluster chews through; bigger splits risk spill).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Environment knobs used by the driver harness.
ENV_SF_DIR = "SPARK_GRAFT_SF_DIR"
ENV_CPUS = "SPARK_GRAFT_CPUS"

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def default_parallelism() -> int:
    cpus = os.environ.get(ENV_CPUS)
    if cpus:
        return max(1, int(cpus))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "ice_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    On a real cluster, ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cores = default_parallelism()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # 1x cores locally; on a cluster pass 2-3x total cores and let
        # AQE coalesce. Too many tiny shuffle partitions at sf0.1
        # costs task overhead; too few at 100 TB spills.
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- Adaptive execution: the scale workhorse ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- Shuffle/persist codec: zstd over the lz4 default (guide
        # §2.3 "measure both"). Measured r14-opt on g02's 120M-edge
        # array exchange at sf10: the intersect phase 284.8 -> 150.2 s
        # on codec alone (identical values) — long-array shuffle blocks
        # compress far better under zstd, and the saved IO dwarfs the
        # extra CPU. At sf0.1 shuffles are KBs either way (headline
        # A/B flat, see OPTIMIZATION_r14.md); at cluster scale the
        # byte cut also prices network, not just local disk.
        .config("spark.io.compression.codec", "zstd")
        # --- Scan sizing ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # --- Python/Arrow: Pandas UDFs move columnar batches ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- Broadcast: dims up to 64 MiB broadcast instead of shuffle ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Heap: Spark's 1g default driver heap is sized for a thin
        # cluster driver, not local[N] where the "driver" IS all N
        # executors. Long sessions (the 144-query correctness sweep,
        # bench + sf1 probe) accumulate codegen classes, broadcasts,
        # and per-query caches and OOM at 1g. Takes effect only when
        # this process launches the JVM (spark-submit sets its own).
        .config("spark.driver.memory", "8g")
        # --- Timestamps: testdata uses ns/ms parquet timestamps ---
        # Spark has no TIMESTAMP(NANOS) type: read nanos as long and
        # convert explicitly (see tables.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.session.timeZone", "UTC")
        # --- ANSI ON, pinned (Spark 4 default, but never rely on it):
        # int64 overflow must FAIL LOUDLY, not wrap — e24's r2 terms
        # and g02's packed closure keys depend on this. A query that
        # overflows only at 100x counts corrupts silently with ANSI
        # off; tools/lint_overflow.py statically flags the class.
        .config("spark.sql.ansi.enabled", "true")
        # Keep driver chatter down in benchmarks.
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Runtime-settable confs the events loader depends on; the explicit
#: opt-in for foreign sessions (get_spark sets them at build time).
EVENTS_SESSION_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs ice_spark's loaders assume on a session
    built elsewhere (e.g. a bare ``SparkSession.builder.getOrCreate()``).
    Call this once after creating a foreign session; ``get_spark``
    sessions are already configured."""
    for k, v in EVENTS_SESSION_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    return spark


def assert_ansi(spark: SparkSession) -> None:
    """Fail loudly if ANSI mode is off. Every gate/bench/probe session
    must run ANSI so int64 overflow RAISES instead of wrapping — a
    query whose arithmetic only overflows at 100x counts (r11's e24)
    silently corrupts results under non-ANSI semantics and would
    hash-green at every gate SF."""
    v = str(spark.conf.get("spark.sql.ansi.enabled", "true")).lower()
    if v != "true":
        raise AssertionError(
            "spark.sql.ansi.enabled must be true in gate/bench/probe "
            f"sessions (got {v!r}): int64 overflow must fail, not wrap"
        )


def sf_dir() -> str:
    return os.environ.get(ENV_SF_DIR, DEFAULT_SF_DIR)
