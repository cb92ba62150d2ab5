"""Streaming KMV distinct-count: bounded-state cardinality per group.

The batch KMV sketch (queries/sketches.py) is mergeable — the k
smallest distinct hashes of a union are found among the k smallest of
each part. That makes it a natural streaming operator: per-group
state is a sorted array of at most k longs, each micro-batch merges
its hashes in, and the emitted estimate after any prefix of batches
equals the batch estimate over the same prefix (pinned in
tests/test_streaming_sketch.py).

Contrast with Spark's built-in `approx_count_distinct`, which is not
available as incremental per-group state in arbitrary stateful
operators; this gives the same bounded-memory property (k longs per
group, vs an unbounded exact-distinct set in dropDuplicates-based
counting) with a deterministic, engine-portable estimate.

Scale: state per group is k*8 bytes regardless of stream length;
the shuffle moves only (group, hash) pairs, and the per-batch merge
is O(batch + k log k) per group in Arrow-batched pandas.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Same portable hash constants as queries/sketches.py (P = 2^31 - 1).
P = 2_147_483_647
HASH_A = 1686629717
HASH_B = 11
DEFAULT_K = 64

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("kmv_estimate", T.LongType()),
        T.StructField("n_kept", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("kmin", T.ArrayType(T.LongType()))])


def kmv_estimate(kmin: list[int], k: int) -> int:
    """Estimate distinct count from the k smallest hashes (exact when
    fewer than k hashes have been seen)."""
    if len(kmin) < k:
        return len(kmin)
    return (k - 1) * P // kmin[-1]


def _sketch_fn(k: int):
    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        (group_key,) = key
        kmin: list[int] = list(state.get[0]) if state.exists else []
        merged = set(kmin)
        for pdf in pdfs:
            merged.update(int(h) for h in pdf["h"])
        kmin = sorted(merged)[:k]
        state.update((kmin,))
        yield pd.DataFrame(
            [
                {
                    "group_key": group_key,
                    "kmv_estimate": kmv_estimate(kmin, k),
                    "n_kept": len(kmin),
                }
            ]
        )

    return fn


def kmv_distinct_stream(
    stream: DataFrame,
    key_col: str,
    group_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-group streaming distinct-count estimate with k-longs state.

    ``key_col`` must be an integral column (the portable hash is
    modular arithmetic over BIGINT, the same spec as the batch
    sketches so stream and batch estimates are comparable).
    """
    h = ((F.col(key_col).cast("long") % P) * HASH_A + HASH_B) % P
    prepared = stream.select(
        F.col(group_col).cast("string").alias("group_key"), h.alias("h")
    )
    return prepared.groupBy("group_key").applyInPandasWithState(
        _sketch_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def countmin_stream(stream: DataFrame, key_col: str) -> DataFrame:
    """Streaming count-min sketch build: counts per (row_i, cell).

    Uses the same (row, multiplier, offset) plan as the batch k02
    query, so a stream-built sketch and a batch-built sketch over the
    same data are row-for-row identical (pinned in tests). No custom
    state operator is needed: a streaming groupBy over the FIXED
    d*w cell space is bounded state by construction (≤ 2048 rows in
    the state store regardless of key cardinality or stream length) —
    the built-in incremental aggregation is exactly the sketch merge.
    """
    from ice_spark.queries.sketches import CM_ROWS, CM_WIDTH

    params = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, a, b in CM_ROWS
        ]
    )
    key_mod = F.col(key_col).cast("long") % P
    return (
        stream.select(key_mod.alias("k"), F.explode(params).alias("p"))
        .select(
            F.col("p.row_i").alias("row_i"),
            ((F.col("k") * F.col("p.a") + F.col("p.b")) % P % CM_WIDTH).alias("cell"),
        )
        .groupBy("row_i", "cell")
        .count()
    )


def hll_stream(stream: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """Streaming HyperLogLog register build: per (group, register) max
    rho — the same spec as the batch k07 query, so a stream-built
    sketch equals a batch-built one over the same data (register max
    is the HLL merge, and max is order-insensitive).

    Like countmin_stream, no custom state operator is needed: the
    register space is FIXED (64 registers per group), so a streaming
    groupBy + MAX is bounded state by construction (≤ 64 rows per
    group in the state store regardless of stream length) and the
    built-in incremental aggregation IS the sketch merge. Finalize
    with hll_finalize at read time."""
    from ice_spark.queries.sketches import hll_registers

    return hll_registers(
        stream.select(
            F.col(group_col).cast("string").alias("group_key"),
            F.col(key_col).cast("long").alias("__k"),
        ),
        "__k",
        ["group_key"],
    )


def hll_finalize(
    registers: DataFrame, group_cols: tuple[str, ...] = ("group_key",)
) -> DataFrame:
    """Distinct-count estimate per group from (group..., reg, m_j)
    register rows — identical integer arithmetic to the batch k07
    query (exact bigint harmonic sum, one double division). For
    windowed registers pass group_cols=("win", "group_key")."""
    from ice_spark.queries.sketches import HLL_M, HLL_W

    top = 1 << (HLL_W + 1)
    sums = registers.groupBy(*group_cols).agg(
        F.count("*").alias("registers_hit"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - m_j)")).alias(
            "s_present"
        ),
    )
    return sums.select(
        *group_cols,
        (F.col("s_present") + (HLL_M - F.col("registers_hit")) * F.lit(top)).alias(
            "harmonic_sum"
        ),
    ).withColumn(
        "hll_estimate",
        F.floor(F.lit(0.709 * HLL_M * HLL_M * top) / F.col("harmonic_sum")).cast(
            "long"
        ),
    )


def hll_windowed_stream(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    group_col: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked event-time HLL: distinct-count registers per
    (tumbling window, group). State per open window is still ≤ 64
    register rows per group, and the watermark bounds HOW MANY
    windows stay open — the two dimensions of streaming state,
    both bounded. Late events inside the watermark update their
    window's registers (max is idempotent and order-free, the
    friendliest possible late-data semantics); events later than the
    watermark are dropped with the state already finalized.
    Finalize with hll_finalize grouped by (window, group)."""
    from ice_spark.queries.sketches import HLL_M, HLL_W, _hll_mix_col

    prepared = _hll_mix_col(
        stream.withWatermark(ts_col, watermark).select(
            F.col(ts_col).alias("__ts"),
            F.col(group_col).cast("string").alias("group_key"),
            F.col(key_col).cast("long").alias("__k"),
        ),
        "__k",
    ).select(
        F.window("__ts", window).alias("win"),
        "group_key",
        (F.col("h") % HLL_M).alias("reg"),
        F.expr(f"h div {HLL_M}").alias("w"),
    ).select(
        "win",
        "group_key",
        "reg",
        F.when(F.col("w") == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W) - (F.length(F.bin("w")) - 1))
        .alias("rho"),
    )
    return prepared.groupBy("win", "group_key", "reg").agg(
        F.max("rho").alias("m_j")
    )


# --- streaming bottom-k-by-hash quantile sample (k13's stream form) ---

BK_A, BK_B = 1566083941, 97  # k13's pair, so stream == batch estimates
BK_K = 256
BK_PCTS = ((1, 2), (9, 10), (99, 100))

BK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("pct", T.LongType()),
        T.StructField("est", T.LongType()),
        T.StructField("n_kept", T.LongType()),
    ]
)

# parallel arrays: hash, tiebreak id, value — the 256 smallest (h, id)
_BK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.LongType())),
    ]
)


def bottomk_quantiles(vals: list[int], pcts=BK_PCTS) -> list[tuple[int, int]]:
    """(pct, estimate) from a bottom-k sample's values — the value at
    rank ceil(k*p) of the sorted sample (k13's order statistic)."""
    s = sorted(vals)
    k = len(s)
    out = []
    for p_num, p_den in pcts:
        r = (k * p_num + p_den - 1) // p_den if k else 0
        out.append((p_num * 100 // p_den, s[max(r, 1) - 1] if k else None))
    return out


def _bottomk_fn(k: int):
    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        (group_key,) = key
        if state.exists:
            hs, ids, vals = (list(x) for x in state.get)
            entries = list(zip(hs, ids, vals))
        else:
            entries = []
        for pdf in pdfs:
            entries.extend(
                (int(h), int(i), int(v))
                for h, i, v in zip(pdf["h"], pdf["id"], pdf["v"])
            )
        # keep the k smallest by (hash, id) — the KMV merge rule, so
        # union-of-streams == stream-of-union (mergeable)
        entries = sorted(set(entries))[:k]
        state.update(
            (
                [e[0] for e in entries],
                [e[1] for e in entries],
                [e[2] for e in entries],
            )
        )
        rows = [
            {
                "group_key": group_key,
                "pct": pct,
                "est": est,
                "n_kept": len(entries),
            }
            for pct, est in bottomk_quantiles([e[2] for e in entries])
        ]
        yield pd.DataFrame(rows)

    return fn


def bottomk_quantile_stream(
    stream: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str,
    k: int = BK_K,
) -> DataFrame:
    """Per-group streaming quantile estimates from bottom-k-by-hash
    state (k * 24 bytes per group forever): the stream form of the
    batch k13 sketch, same hash pair and tiebreak, so the estimate
    after any prefix of micro-batches equals k13's computation over
    that prefix (pinned in tests/test_streaming_sketch.py). ``id_col``
    must be integral and unique per row (the sample key);
    ``value_col`` integral (quantize first, the k13 cents rule)."""
    h = ((F.col(id_col).cast("long") % P) * BK_A + BK_B) % P
    prepared = stream.select(
        F.col(group_col).cast("string").alias("group_key"),
        h.alias("h"),
        F.col(id_col).cast("long").alias("id"),
        F.col(value_col).cast("long").alias("v"),
    )
    return prepared.groupBy("group_key").applyInPandasWithState(
        _bottomk_fn(k),
        outputStructType=BK_OUTPUT_SCHEMA,
        stateStructType=_BK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
