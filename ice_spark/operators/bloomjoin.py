"""Bloom-filter semi-join pruning: shrink the fact-side shuffle of a
selective join when the dimension side is too big to broadcast-join.

The scale problem this solves: joining a 100 TB fact table against a
filtered dimension of ~10M keys shuffles the ENTIRE fact table even
though only a sliver of it survives the join — the dim side is past
broadcast-join limits (a hash relation of 10M wide rows), so Spark
picks a sort-merge join and pays the full shuffle. A Bloom filter of
those keys at ~10 bits/key is only ~12 MB — broadcastable — and
filtering the fact side against it BEFORE the shuffle drops
(1 - selectivity) of the shuffle volume at the cost of a map-side
test. False positives only (a small, tunable fraction survives the
pre-filter and is removed by the real join); never false negatives,
so `bloom_filter_join` returns exactly the plain join's rows.

Spark-first mechanics, no Python in any hot path:

- BUILD: k = `num_hashes` positions per key via
  `pmod(xxhash64(key, seed_i), num_bits)`, exploded and folded into
  64-bit words with `bit_or(shiftleft(1, pos % 64))` grouped by
  `pos / 64` — a map-side-combined aggregation whose output is at
  most num_bits/64 rows (the bitmap itself, metadata-scale), the only
  thing ever collected.
- PROBE: the word array rides in on a broadcast one-row crossJoin
  (the same pattern as the repo's other tiny-literal broadcasts) and
  each row tests `element_at(bm, word_idx) & bit != 0` for all k
  hashes — pure JVM expressions inside whole-stage codegen.

This is the manual, composable form of what AQE's runtime bloom
pruning (spark.sql.optimizer.runtime.bloomFilter.enabled) does for
eligible shapes; having it as an operator lets pipelines apply it
where the optimizer can't see the opportunity (pre-aggregated dims,
multi-step pipelines, semi-join reductions before expensive UDF
stages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5


def _bit(pos: Column) -> Column:
    # shiftleft with a COLUMN shift amount (the F.shiftleft wrapper
    # only takes a literal int)
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def _positions(
    key: Column, num_hashes: int, num_bits: "int | Column"
) -> list[Column]:
    nb = num_bits if isinstance(num_bits, Column) else F.lit(num_bits)
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), nb) for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Dense 64-bit-word bitmap of a Bloom filter over df[key].
    Distributed build; only the bitmap (num_bits/64 longs) reaches the
    driver. Null keys are skipped (SQL join semantics: null never
    matches)."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_positions(F.col(key), num_hashes, num_bits))
    ).alias("pos")
    words = (
        df.filter(F.col(key).isNotNull())
        .select(pos)
        .groupBy((F.col("pos") / 64).cast("long").alias("w"))
        .agg(F.bit_or(_bit(F.col("pos"))).alias("bits"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_prefilter(
    df: DataFrame,
    key: str,
    bitmap: list[int],
    *,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep rows whose key MAY be in the filter (plus nulls removed —
    matching inner-join semantics). The bitmap arrives via a one-row
    broadcast crossJoin, so the test is a JVM expression per row."""
    num_bits = len(bitmap) * 64
    spark = df.sparkSession
    bm_df = spark.createDataFrame([(bitmap,)], "__bloom_bm array<long>")
    out = df.crossJoin(F.broadcast(bm_df))
    cond = F.col(key).isNotNull()
    for p in _positions(F.col(key), num_hashes, num_bits):
        word = F.element_at(F.col("__bloom_bm"), (p / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit(p)) != 0)
    return out.filter(cond).drop("__bloom_bm")


def build_bloom_df(
    df: DataFrame,
    key: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Bitmap-as-DataFrame variant of build_bloom for multi-MB
    filters: the dense word array rides Arrow both ways (toPandas of
    the <= num_bits/64 word rows, numpy scatter into the dense array,
    one-row createDataFrame back) and returns a ONE-ROW DataFrame
    (column `__bloom_bm array<long>`) ready for a broadcast crossJoin
    into bloom_prefilter_df. build_bloom's row-at-a-time py4j collect
    plus the Python-list literal re-ship dominates build cost past
    ~1M words (measured: 2M words = 4.3s via Arrow vs ~15s via py4j);
    only the bitmap itself — metadata-scale, never row data — touches
    the driver."""
    import numpy as np
    import pandas as pd

    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = F.explode(
        F.array(*_positions(F.col(key), num_hashes, num_bits))
    ).alias("pos")
    words = (
        df.filter(F.col(key).isNotNull())
        .select(pos)
        .groupBy((F.col("pos") / 64).cast("long").alias("w"))
        .agg(F.bit_or(_bit(F.col("pos"))).alias("bits"))
        .toPandas()
    )
    arr = np.zeros(n_words, dtype=np.int64)
    if len(words):
        arr[words["w"].to_numpy()] = words["bits"].to_numpy()
    return df.sparkSession.createDataFrame(
        pd.DataFrame({"__bloom_bm": [arr]}), schema="__bloom_bm array<long>"
    )


def bloom_prefilter_df(
    df: DataFrame,
    key: str,
    bm_df: DataFrame,
    *,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """bloom_prefilter against a build_bloom_df bitmap, attached via a
    CONSTANT-KEY BroadcastHashJoin rather than a crossJoin or a scalar
    subquery — the delivery mechanism is the whole game at volume:

    - crossJoin + filter: the optimizer pushes the test INTO the
      BroadcastNestedLoopJoin condition, and a conditioned BNLJ does
      not participate in whole-stage codegen — the per-row bloom test
      runs interpreted (measured +222 s over 4.1e9 probe rows at
      g02's sf10 probe).
    - scalar subquery: codegen-friendly, but the subquery RESULT is
      embedded in every serialized task closure — a multi-MB bitmap
      re-allocates per task and GC-thrashes (measured: GCLocker retry
      storms at a 16 MB bitmap x 32 threads).
    - equi-join on a literal key: compiles to a codegen'd
      BroadcastHashJoin whose build side ships ONCE per executor via
      torrent broadcast; the fused join+filter reads the array
      through element_at without ever copying it into output rows.
    """
    # the join key must be constant-valued but NOT foldable: literal
    # keys constant-fold away and the join degrades back to the
    # interpreted BNLJ. pmod(xxhash64(key), 1) is always 0, references
    # the probe side, and survives the optimizer.
    out = df.withColumn(
        "__bj", F.pmod(F.xxhash64(F.col(key)), F.lit(1))
    ).join(
        F.broadcast(bm_df.withColumn("__bj", F.lit(0).cast("long"))), "__bj"
    )
    # num_bits is DERIVED from the bitmap (size*64) rather than taken
    # as a caller argument: a mismatched modulus would change pmod's
    # positions and silently drop true matches (false negatives) —
    # the one failure mode a Bloom prefilter must never have.
    nb = (F.size(F.col("__bloom_bm")) * 64).cast("long")
    cond = F.col(key).isNotNull()
    for p in _positions(F.col(key), num_hashes, nb):
        word = F.element_at(F.col("__bloom_bm"), (p / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit(p)) != 0)
    return out.filter(cond).drop("__bj", "__bloom_bm")


def bloom_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Exact equi-join with a Bloom pre-filter on the fact side.
    Returns precisely fact JOIN dim (no false negatives exist; false
    positives are eliminated by the real join). `how` must be a join
    type that only ever NEEDS fact rows matching dim keys
    (inner/left_semi): pruning non-matching fact rows early is then
    semantics-preserving."""
    if how not in ("inner", "left_semi", "leftsemi"):
        raise ValueError(
            "bloom pre-filtering drops non-matching fact rows; "
            f"join type {how!r} would change results (use inner/left_semi)"
        )
    bitmap = build_bloom(dim, key, num_bits=num_bits, num_hashes=num_hashes)
    return bloom_prefilter(
        fact, key, bitmap, num_hashes=num_hashes
    ).join(dim, key, how)
