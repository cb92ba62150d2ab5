"""IVF (inverted-file) approximate nearest neighbor.

The second scale path next to LSH (operators/similarity.py):

1. TRAIN: k-means over a deterministic sample — a fixed number of
   Lloyd iterations, each one a single join+aggregate job (assign →
   recompute centroids). Initial centroids are picked by stable row
   hash, so the index is reproducible without RNG state.
2. ASSIGN: every corpus vector gets its nearest-centroid list id —
   at 100 TB you persist this (partitioned by list id) once.
3. PROBE: a query scans only its n_probe nearest lists — corpus
   pruned to ~n_probe/n_lists of the data, then exact cosine re-rank.

Everything is DataFrame ops: assignment is a broadcast join against
the (tiny) centroid table + per-row argmin; no collect of vectors
(only centroids, which are n_lists × dim floats, come to the driver
between iterations — that IS the k-means sync barrier, same as MLlib).

Driver-pacing bound: training costs exactly ONE Spark job per Lloyd
iteration (assign is lazy and fuses into the update aggregation)
plus one seed job — the job count is independent of n_lists (pinned
in tests/test_ivf.py at n_lists=256). Per-iteration driver traffic
is the n_lists × dim centroid matrix both ways: shipped into the
plan as a SINGLE array literal (one Literal node, not n_lists × dim
expression nodes — at n_lists=256 × dim=64 the per-element form is
a 16k-node expression tree that dominates planning time) and
collected back as n_lists rows. CEILING: keep n_lists × dim ≲ 10^7
(~80 MB of doubles, the broadcast-literal budget); past that, keep
centroids in a DataFrame and assign via crossJoin-broadcast +
per-row argmin instead of a literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ice_spark.operators.similarity import cosine_fixed


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# Knuth multiplicative-hash constant for id-based seed selection.
# The id is reduced mod 2^31 BEFORE the multiply: (id % 2^31) * KNUTH
# tops out at ~5.7e18 < int64 max, so 64-bit ids (snowflake-style, or
# the 49e9 ids of the 50x probe corpus) can't overflow ANSI
# arithmetic — the r8 sf5 probe crashed v06/v10/v11 on exactly this
# before the guard. For ids < 2^31 the reduction is the identity, so
# every gate-SF result (ids <= 2000) is bit-identical.
_SEED_HASH_MULT = 2654435761
_SEED_HASH_MOD = 2147483648


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_lists: int,
    iterations: int = 3,
    sample_fraction: float | None = None,
    id_col: str | None = None,
) -> list[list[float]]:
    """Fixed-iteration Lloyd k-means; returns centroid vectors.

    Fully deterministic AND SQL-replayable:
    - seeds are the n_lists rows with smallest integer hash
      (id*KNUTH mod 2^31, tiebreak id) when `id_col` is given
      (xxhash64 of the vector string otherwise);
    - the centroid update quantizes components to integer micro-units
      and sums bigints, so the means are independent of partition /
      summation order (an exact replica fits in one SQL expression —
      see the v06 oracle). The 1e-6 quantization is far below any
      clustering-relevant signal.
    """
    cols = [F.col(vec_col).alias("v")] + (
        [F.col(id_col).alias("__sid")] if id_col else []
    )
    vecs = corpus.select(*cols)
    if sample_fraction:
        vecs = vecs.sample(fraction=sample_fraction, seed=42)
    if id_col:
        seed_rows = (
            vecs.withColumn(
                "__h",
                ((F.col("__sid") % F.lit(_SEED_HASH_MOD)) * F.lit(_SEED_HASH_MULT))
                % F.lit(_SEED_HASH_MOD),
            )
            .orderBy("__h", "__sid")
            .limit(n_lists)
            .select("v")
            .collect()
        )
    else:
        seed_rows = (
            vecs.withColumn("__h", F.xxhash64(F.col("v").cast("string")))
            .orderBy("__h")
            .limit(n_lists)
            .select("v")
            .collect()
        )
    centroids = [list(r.v) for r in seed_rows]
    for _ in range(iterations):
        assigned = assign_lists(vecs, "v", centroids)
        new = (
            assigned.select("__list", F.posexplode("v").alias("d", "x"))
            .withColumn("u", F.round(F.col("x").cast("double") * 1e6).cast("long"))
            .groupBy("__list", "d")
            .agg(
                (
                    F.sum("u").cast("double")
                    / (F.count(F.lit(1)).cast("double") * F.lit(1e6))
                ).alias("m")
            )
            .groupBy("__list")
            .agg(F.sort_array(F.collect_list(F.struct("d", "m"))).alias("dims"))
            .select("__list", F.col("dims.m").alias("c"))
            .collect()
        )
        for r in new:
            centroids[r['__list']] = list(r['c'])
    return centroids


def assign_lists(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add __list = argmin_j dist(vec, centroid_j). The centroid array
    is a literal (broadcast with the plan); per-row argmin is one
    narrow expression — no join, no shuffle."""
    # ONE literal node for the whole centroid matrix (driver-pacing
    # bound — see module docstring)
    cent_lit = F.lit([[float(x) for x in c] for c in centroids])
    dists = F.transform(cent_lit, lambda c: _sq_dist(F.col(vec_col), c))
    best = F.array_position(dists, F.array_min(dists)) - 1
    return df.withColumn("__list", best.cast("int"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    n_lists: int = 8,
    n_probe: int = 2,
    k: int = 3,
    iterations: int = 2,
) -> DataFrame:
    """Approximate top-k: probe the n_probe nearest lists per query,
    exact cosine re-rank within them."""
    centroids = train_centroids(corpus, vec_col, n_lists, iterations, id_col=id_col)
    c_assigned = assign_lists(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        centroids,
    )
    # per query: the n_probe nearest centroid ids as an array
    cent_lit = F.lit([[float(x) for x in c] for c in centroids])
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )
    dist_structs = F.transform(
        cent_lit,
        lambda c, i: F.struct(_sq_dist(F.col("__qv"), c).alias("d"), i.alias("lid")),
    )
    probes = F.slice(F.array_sort(dist_structs), 1, n_probe)
    q = q.withColumn("__probe", F.transform(probes, lambda s: s["lid"].cast("int")))
    scored = (
        c_assigned.join(
            F.broadcast(q),
            F.array_contains(F.col("__probe"), F.col("__list"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            # fixed-dim unrolled cosine: the centroid length IS the
            # corpus dim (train_centroids seeds are corpus rows)
            F.round(cosine_fixed("__qv", "__cv", len(centroids[0])), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
