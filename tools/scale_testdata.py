"""Scale up the driver testdata by an integer factor (sf0.1 -> ~sf1).

The driver ships sf0.001/0.01/0.1 (TESTDATA.md). The per-round bench
runs at sf0.1; cliffs that only appear at 10x (shuffle spill, LSH
bucket growth, manifest width) stay invisible. This tool builds a
larger dataset from the existing one WITHOUT inventing new
distributions: each table is a union of `factor` copies with
surrogate keys shifted per copy so referential integrity holds
(copy k of lineitem joins copy k of orders/part/supplier, etc.).

Shape caveats, stated honestly:
- value distributions repeat exactly `factor` times (real TPC-H sf1
  draws fresh values) — aggregate CARDINALITIES (group counts) are
  right, value entropy is not;
- document texts get a per-copy prefix, so near-duplicate density is
  ~factor times HIGHER than a real corpus — which makes the dedup
  probe a worst-case stressor for the LSH bucket cap, exactly what a
  scale probe should stress;
- events keep their timestamps (event density grows 10x in the same
  window), so sessionization/windows see denser, not longer, data.

Deterministic: same input -> same output; no RNG anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Per-copy key offsets, far above any base-key range.
OFF = 1_000_000_000

# table -> columns to shift by k*OFF (copy index k). Dimension tables
# region/nation are fixed vocabularies and are not replicated.
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ("region", "nation")


def _scaled_copy(df: DataFrame, table: str, k: int) -> DataFrame:
    if k == 0:
        return df
    out = df
    for c in SHIFT[table]:
        out = out.withColumn(c, F.col(c) + F.lit(k * OFF))
    if table == "documents":
        # prefix keeps copies NEAR-duplicates (not exact): stresses
        # minhash/LSH instead of collapsing into the exact-dup path
        out = out.withColumn("text", F.concat(F.lit(f"v{k} "), F.col("text")))
    return out


def make_scaled(
    spark: SparkSession, src_dir: str, dest_dir: str, factor: int = 10
) -> dict:
    """Write `factor`-scaled copies of every table to dest_dir.
    Idempotent: skips tables whose output already exists."""
    os.makedirs(dest_dir, exist_ok=True)
    written = {}
    for table in COPY_AS_IS + tuple(SHIFT):
        src = os.path.join(src_dir, f"{table}.parquet")
        dst = os.path.join(dest_dir, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            written[table] = "cached"
            continue
        df = spark.read.parquet(src)
        if table in COPY_AS_IS:
            out = df
        else:
            parts = [_scaled_copy(df, table, k) for k in range(factor)]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        # one shuffle-free write; partitions sized by the source splits
        out.write.mode("overwrite").parquet(dst)
        written[table] = "written"
    return written


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ice_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache", "sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("scale_testdata")
    print(make_scaled(spark, src, dst, factor))
