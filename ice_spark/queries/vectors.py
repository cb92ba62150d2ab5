"""Embedding / similarity-search queries over the `embeddings` table.

Dot products on the Spark side are zip_with+aggregate Column
expressions (codegen); oracles compute the same sums via index
expansion. Cosines are rounded to 6 digits on both sides before any
ranking/filter so last-ulp summation-order differences can't flip
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.operators.similarity import brute_force_topk, cosine_fixed
from ice_spark.queries.registry import register
from ice_spark.tables import load_table

_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)
_SQL_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (x, y) -> x + y))"
)


@register(
    "v01_knn_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             ROUND({_SQL_DOT.format(a='qv', b='cv')}
                   / ({_SQL_NORM.format(a='qv')} * {_SQL_NORM.format(a='cv')}), 6)
               AS cos_sim
      FROM q JOIN c ON query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) r WHERE rank <= 3
    """,
    doc="Exact cosine top-3 neighbors for query vectors (vec_id < 5); "
    "broadcast query set, single corpus scan.",
)
def v01(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = brute_force_topk(
        corpus=emb,
        queries=queries,
        id_col="vec_id",
        vec_col="embedding",
        dim=64,
        query_id_col="vec_id",
        query_vec_col="embedding",
        k=3,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "v02_label_centroids",
    """
    SELECT label, i - 1 AS dim,
           ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 4) AS centroid_val
    FROM embeddings, generate_series(1, 8) t(i)
    GROUP BY label, i
    """,
    doc="Per-label centroid of the first 8 embedding dims "
    "(posexplode + avg; full-dim variant used by the ANN operator).",
)
def v02(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.slice("embedding", 1, 8)).alias("dim", "v")
    )
    return (
        ex.groupBy("label", F.col("dim").cast("long").alias("dim"))
        .agg(
            F.round(F.sum(F.col("v").cast("double")) / F.count(F.lit(1)), 4).alias(
                "centroid_val"
            )
        )
    )


@register(
    "v03_label_norm_stats",
    f"""
    SELECT label, COUNT(*) AS n,
           ROUND(SUM(nrm) / COUNT(*), 6) AS avg_norm,
           ROUND(MIN(nrm), 6) AS min_norm,
           ROUND(MAX(nrm), 6) AS max_norm
    FROM (SELECT label, {_SQL_NORM.format(a='embedding')} AS nrm FROM embeddings) t
    GROUP BY label
    """,
    doc="L2-norm statistics per label.",
)
def v03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.similarity import _norm_unrolled_sql

    emb = load_table(spark, sf_dir, "embeddings")
    t = emb.select(
        "label", F.expr(_norm_unrolled_sql("embedding", 64)).alias("nrm")
    )
    return t.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("nrm") / F.count(F.lit(1)), 6).alias("avg_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


def _sql_bucket(col: str, n_planes: int = 6, seed0: int = 1) -> str:
    # The hyperplanes are deterministic floats (LCG, operators/
    # similarity._hyperplane); inlining the exact literals makes the
    # projection fold reproducible in DuckDB, so even the bucket
    # assignment is oracle-checked. seed0 selects the band (matches
    # operators.similarity.lsh_bucket's seed0).
    from ice_spark.operators.similarity import _hyperplane

    terms = []
    for pidx in range(n_planes):
        plane = _hyperplane(64, seed=seed0 + pidx)
        lits = "[" + ", ".join(repr(v) for v in plane) + "]"
        proj = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, 64), "
            f"i -> CAST({col}[i] AS DOUBLE) * ({lits})[i])), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2 ** pidx} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _v04_oracle(bands: int = 4, n_planes: int = 8) -> str:
    band_rel = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, {b} AS band, "
        f"{_sql_bucket('e', n_planes, b * n_planes + 1)} AS key FROM corpus"
        for b in range(bands)
    )
    return f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(embedding)),
                            i -> CAST(embedding[i] AS DOUBLE)) AS e
      FROM embeddings
    ),
    planted AS (
      SELECT vid + 10000000 AS vec_id, e FROM (
        SELECT vec_id AS vid,
               list_transform(generate_series(1, len(embedding)),
                 i -> CAST(embedding[i] AS DOUBLE)
                      + CAST((vec_id * 31 + i * 7) % 11 - 5 AS DOUBLE)
                        * CAST(0.01 AS DOUBLE)) AS e
        FROM embeddings WHERE vec_id % 10 = 0) t
    ),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
    bk AS (
{band_rel}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM bk a JOIN bk b
        ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
    ),
    ver AS (
      SELECT va, vb,
             {_SQL_DOT.format(a='ca.e', b='cb.e')}
               / ({_SQL_NORM.format(a='ca.e')} * {_SQL_NORM.format(a='cb.e')}) AS c
      FROM cand
      JOIN corpus ca ON ca.vec_id = va
      JOIN corpus cb ON cb.vec_id = vb
    )
    SELECT va AS vec_a, vb AS vec_b, ROUND(c, 6) AS cos_sim
    FROM ver WHERE c >= 0.9
    """


@register(
    "v04_cosine_neardup_pairs",
    _v04_oracle(),
    doc="Embedding near-duplicate pairs at cosine >= 0.9 over a "
    "deterministically seeded corpus (every vec_id % 10 == 0 vector "
    "gets a perturbed near-copy at id+10M, cos ~0.967 — the t11 "
    "seeded-PII idiom for vectors, since the raw testdata plants no "
    "true dups). Candidates come from banded sign-bit LSH (4 bands x "
    "8 hyperplanes, equi-join on (band, bucket), buckets capped at "
    "DEFAULT_MAX_BUCKET), then every candidate is exact-verified "
    "with the rounded cosine — the d04 shape for vectors. The oracle "
    "inlines the 32 hyperplane literals and replays seeding, "
    "banding, candidate join, and verify; the bucket cap is the one "
    "Spark-side guard the oracle does NOT replay, and like the "
    "posting caps it is a no-op at test SF (max (band,key) bucket "
    "well under 512), so gate results are bit-identical — at larger "
    "SF an over-cap bucket diverges plan from oracle by design "
    "(bounded recall loss, reportable via the d17 audit idiom). "
    "Re-specced "
    "in r8 from an exact all-pairs self-join (O(n²) "
    "BroadcastNestedLoopJoin — the one unconditionally quadratic "
    "gated plan; VERDICT r7): this plan is O(candidates) with a hard "
    "per-bucket bound and survives corpus scale-up. The exact "
    "all-pairs audit lives on in v12's bounded exact side.",
)
def v04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.similarity import banded_cosine_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    planted = (
        emb.where((F.col("vec_id") % 10) == 0)
        .select(
            (F.col("vec_id") + F.lit(10_000_000).cast("long")).alias("vec_id"),
            F.expr(
                "transform(sequence(1, size(embedding)), "
                "i -> CAST(element_at(embedding, i) AS DOUBLE) "
                "+ CAST((vec_id * 31 + i * 7) % 11 - 5 AS DOUBLE) "
                "* CAST(0.01 AS DOUBLE))"
            ).alias("e"),
        )
    )
    corpus = base.unionByName(planted)
    pairs = banded_cosine_neardup_pairs(
        corpus, "vec_id", "e", dim=64, n_planes=8, bands=4, threshold=0.9
    )
    return pairs.select(
        F.col("id_a").alias("vec_a"), F.col("id_b").alias("vec_b"), "cos_sim"
    )


def _v05_oracle() -> str:
    bucket = _sql_bucket

    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, {bucket('embedding')} AS bq
      FROM embeddings WHERE vec_id < 5
    ),
    c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, {bucket('embedding')} AS bc
      FROM embeddings
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             ROUND({_SQL_DOT.format(a='qv', b='cv')}
                   / ({_SQL_NORM.format(a='qv')} * {_SQL_NORM.format(a='cv')}), 6)
               AS cos_sim
      FROM c JOIN q ON bq = bc AND query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS INT)
               AS rank
      FROM scored
    ) r WHERE rank <= 3
    """


@register(
    "v05_lsh_ann",
    _v05_oracle(),
    doc="LSH-bucketed approximate NN (random hyperplanes, sign-bit "
    "buckets, exact re-rank within bucket). The oracle inlines the "
    "deterministic hyperplane literals and replays bucketing, "
    "candidate join, and rounded-cosine re-rank.",
)
def v05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_topk(
        corpus=emb,
        queries=queries,
        id_col="vec_id",
        vec_col="embedding",
        query_id_col="vec_id",
        query_vec_col="embedding",
        dim=64,
        k=3,
        n_planes=6,
    )


def _v06_oracle() -> str:
    # Full SQL replay of the IVF index build: integer-hash seed
    # selection, one Lloyd iteration with integer-microunit centroid
    # means (exact in any summation order), nearest-list assignment,
    # probe selection, cosine re-rank. Every arithmetic step mirrors
    # operators/ivf.py: distances fold left-to-right in double, means
    # are double(sum_bigint)/(n*1e6), ties break on list id.
    from ice_spark.operators.ivf import _SEED_HASH_MOD, _SEED_HASH_MULT

    def dist(vec: str, cent: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(generate_series(1, 64), i -> "
            f"(CAST({vec}[i] AS DOUBLE) - {cent}[i]) * "
            f"(CAST({vec}[i] AS DOUBLE) - {cent}[i]))), (x, y) -> x + y)"
        )

    return f"""
    WITH seed AS (
      SELECT lid, embedding FROM (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (
                 ORDER BY ((vec_id % {_SEED_HASH_MOD}) * {_SEED_HASH_MULT}) % {_SEED_HASH_MOD}, vec_id
               ) - 1 AS lid
        FROM embeddings) t WHERE lid < 8
    ),
    c0 AS (SELECT lid, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS c FROM seed),
    a0 AS (
      SELECT vec_id, embedding, lid FROM (
        SELECT e.vec_id, e.embedding, k.lid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id ORDER BY {dist('e.embedding', 'k.c')}, k.lid
               ) AS rn
        FROM embeddings e CROSS JOIN c0 k) t WHERE rn = 1
    ),
    upd AS (
      SELECT lid, i AS dim,
             CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 1e6) AS m
      FROM a0 CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i)
      GROUP BY lid, i
    ),
    c1 AS (
      SELECT c0.lid, COALESCE(u.c, c0.c) AS c
      FROM c0 LEFT JOIN (
        SELECT lid, list(m ORDER BY dim) AS c FROM upd GROUP BY lid) u USING (lid)
    ),
    a1 AS (
      SELECT vec_id, embedding, lid FROM (
        SELECT e.vec_id, e.embedding, k.lid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id ORDER BY {dist('e.embedding', 'k.c')}, k.lid
               ) AS rn
        FROM embeddings e CROSS JOIN c1 k) t WHERE rn = 1
    ),
    qp AS (
      SELECT query_id, qv, lid FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qv, k.lid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {dist('q.embedding', 'k.c')}, k.lid
               ) AS rn
        FROM embeddings q CROSS JOIN c1 k WHERE q.vec_id < 5) t WHERE rn <= 3
    ),
    scored AS (
      SELECT query_id, a1.vec_id AS neighbor_id,
             ROUND({_SQL_DOT.format(a='qv', b='a1.embedding')}
                   / ({_SQL_NORM.format(a='qv')} * {_SQL_NORM.format(a='a1.embedding')}), 6)
               AS cos_sim
      FROM qp JOIN a1 ON qp.lid = a1.lid AND query_id <> a1.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      FROM scored) r WHERE rank <= 3
    """


@register(
    "v06_ivf_ann",
    _v06_oracle(),
    doc="IVF approximate NN: deterministic k-means lists, probe the "
    "nearest n_probe lists, exact cosine re-rank (the partition-"
    "pruned scale path next to LSH). The oracle replays the ENTIRE "
    "index build in SQL — integer-hash seeding, one quantized Lloyd "
    "iteration, assignment, probes, re-rank — so index construction "
    "itself is hash-checked, not just the final distances.",
)
def v06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        n_lists=8, n_probe=3, k=3, iterations=1,
    )


_SQL_Q8_SCALE = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))), "
    "(a, b) -> greatest(a, b)) / 127"
)
# mean abs reconstruction error of symmetric int8 quantization
_SQL_Q8_MAE = (
    "CASE WHEN s = 0 THEN CAST(0 AS DOUBLE) ELSE "
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(embedding, v -> "
    "abs(CAST(v AS DOUBLE) - round(CAST(v AS DOUBLE) / s) * s))), "
    "(a, b) -> a + b) / len(embedding) END"
)


@register(
    "v07_int8_quantization",
    f"""
    WITH per_vec AS (
      SELECT label, s,
             CAST(ROUND({_SQL_Q8_MAE} * 1e6) AS BIGINT) AS mae_u,
             CAST(ROUND(s * 1e9) AS BIGINT) AS scale_u
      FROM (SELECT label, embedding, {_SQL_Q8_SCALE} AS s FROM embeddings)
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(scale_u) AS DOUBLE) / 1e9 / COUNT(*) AS avg_scale,
           CAST(SUM(mae_u) AS DOUBLE) / 1e6 / COUNT(*) AS avg_mae,
           CAST(MAX(mae_u) AS DOUBLE) / 1e6 AS max_mae
    FROM per_vec
    GROUP BY label
    """,
    doc="Symmetric int8 embedding quantization quality per label: "
    "per-vector scale = max|v|/127, mean-abs reconstruction error. "
    "Map-only per-vector expressions + one aggregate shuffle; error "
    "stats aggregated in exact integer micro-units so both engines "
    "agree bit-for-bit. At 100 TB this is the pre-write audit for an "
    "int8-quantized vector store (4x footprint cut).",
)
def v07(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scale = (
        "aggregate(embedding, CAST(0 AS DOUBLE), "
        "(a, v) -> greatest(a, abs(CAST(v AS DOUBLE)))) / 127"
    )
    mae = (
        "CASE WHEN s = 0D THEN 0D ELSE "
        "aggregate(embedding, CAST(0 AS DOUBLE), "
        "(a, v) -> a + abs(CAST(v AS DOUBLE) - round(CAST(v AS DOUBLE) / s) * s))"
        " / size(embedding) END"
    )
    per_vec = emb.select(
        "label",
        F.expr(scale).alias("s"),
        "embedding",
    ).select(
        "label",
        F.expr(f"CAST(ROUND(({mae}) * 1e6) AS BIGINT)").alias("mae_u"),
        F.expr("CAST(ROUND(s * 1e9) AS BIGINT)").alias("scale_u"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum("scale_u").cast("double") / 1e9 / F.count(F.lit(1))).alias("avg_scale"),
        (F.sum("mae_u").cast("double") / 1e6 / F.count(F.lit(1))).alias("avg_mae"),
        (F.max("mae_u").cast("double") / 1e6).alias("max_mae"),
    )


def _v08_oracle() -> str:
    from ice_spark.operators.similarity import srp_signature_duckdb_sql

    return f"""
    WITH sigs AS (
      SELECT vec_id, label,
             {srp_signature_duckdb_sql('embedding', 16)} AS sig
      FROM embeddings
    )
    SELECT sig,
           COUNT(*) AS n_vecs,
           COUNT(DISTINCT label) AS n_labels,
           MIN(vec_id) AS min_vec_id
    FROM sigs
    GROUP BY sig
    HAVING COUNT(*) >= 2
    """


@register(
    "v08_srp_signature_buckets",
    _v08_oracle(),
    doc="Signed-random-projection (hyperplane LSH) signatures: 16 "
    "Rademacher planes from a portable integer formula, one 16-bit "
    "signature per vector, bucketed to near-duplicate candidate "
    "groups. Map-only signature pass + one aggregation shuffle; at "
    "100 TB the bucket join replaces an O(n^2) cosine sweep. The "
    "projection fold is order-pinned so both engines agree on every "
    "sign bit (operators/similarity.srp_signature_sql).",
)
def v08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.similarity import srp_signature_unrolled_sql

    emb = load_table(spark, sf_dir, "embeddings")
    sigs = emb.select(
        "vec_id",
        "label",
        F.expr(srp_signature_unrolled_sql("embedding", 16)).alias("sig"),
    )
    return (
        sigs.groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.countDistinct("label").alias("n_labels"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .where(F.col("n_vecs") >= 2)
    )


@register(
    "v09_centroid_pairwise_cosine",
    """
    WITH c AS (
      SELECT label, i AS dim,
             CAST(ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*) * 1000000)
                  AS BIGINT) AS cu
      FROM embeddings, generate_series(1, 64) t(i)
      GROUP BY label, i
    ),
    n AS (SELECT label, SUM(cu * cu) AS nsq FROM c GROUP BY label),
    p AS (
      SELECT a.label AS label_a, b.label AS label_b, SUM(a.cu * b.cu) AS dot
      FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           ROUND(dot / SQRT(na.nsq) / SQRT(nb.nsq), 6) AS cos_sim
    FROM p
    JOIN n na ON na.label = p.label_a
    JOIN n nb ON nb.label = p.label_b
    """,
    doc="Pairwise cosine similarity between label centroids: centroids "
    "quantized to integer micro-units per dimension, so the dot "
    "products and norms are exact bigint sums; only sqrt and one "
    "division run in floating point. Label-space output (45 pairs) "
    "regardless of corpus size.",
)
def v09(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    c = (
        emb.select("label", F.posexplode("embedding").alias("dim0", "v"))
        .groupBy("label", (F.col("dim0") + 1).alias("dim"))
        .agg(
            F.expr(
                "CAST(ROUND(SUM(CAST(v AS DOUBLE)) / COUNT(*) * 1000000) AS BIGINT)"
            ).alias("cu")
        )
    )
    n = c.groupBy("label").agg(F.sum(F.col("cu") * F.col("cu")).alias("nsq"))
    a, b = c.alias("a"), c.alias("b")
    p = (
        a.join(b, (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(F.sum(F.col("a.cu") * F.col("b.cu")).alias("dot"))
    )
    na, nb = n.alias("na"), n.alias("nb")
    return (
        p.join(na, F.col("na.label") == F.col("label_a"))
        .join(nb, F.col("nb.label") == F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot") / F.sqrt(F.col("na.nsq")) / F.sqrt(F.col("nb.nsq")), 6
            ).alias("cos_sim"),
        )
    )


def _v10_oracle() -> str:
    # Replays the same deterministic k-means index build as the v06
    # oracle (integer-hash seeding, one quantized Lloyd iteration,
    # nearest-list assignment), then finds near-duplicate pairs
    # WITHIN each cluster — the SemDeDup candidate-space reduction.
    from ice_spark.operators.ivf import _SEED_HASH_MOD, _SEED_HASH_MULT

    def dist(vec: str, cent: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(generate_series(1, 64), i -> "
            f"(CAST({vec}[i] AS DOUBLE) - {cent}[i]) * "
            f"(CAST({vec}[i] AS DOUBLE) - {cent}[i]))), (x, y) -> x + y)"
        )

    return f"""
    WITH seed AS (
      SELECT lid, embedding FROM (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (
                 ORDER BY ((vec_id % {_SEED_HASH_MOD}) * {_SEED_HASH_MULT}) % {_SEED_HASH_MOD}, vec_id
               ) - 1 AS lid
        FROM embeddings) t WHERE lid < 8
    ),
    c0 AS (SELECT lid, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS c FROM seed),
    a0 AS (
      SELECT vec_id, embedding, lid FROM (
        SELECT e.vec_id, e.embedding, k.lid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id ORDER BY {dist('e.embedding', 'k.c')}, k.lid
               ) AS rn
        FROM embeddings e CROSS JOIN c0 k) t WHERE rn = 1
    ),
    upd AS (
      SELECT lid, i AS dim,
             CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * 1e6) AS m
      FROM a0 CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i)
      GROUP BY lid, i
    ),
    c1 AS (
      SELECT c0.lid, COALESCE(u.c, c0.c) AS c
      FROM c0 LEFT JOIN (
        SELECT lid, list(m ORDER BY dim) AS c FROM upd GROUP BY lid) u USING (lid)
    ),
    a1 AS (
      SELECT vec_id, embedding, lid FROM (
        SELECT e.vec_id, e.embedding, k.lid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id ORDER BY {dist('e.embedding', 'k.c')}, k.lid
               ) AS rn
        FROM embeddings e CROSS JOIN c1 k) t WHERE rn = 1
    )
    SELECT lid, vec_a, vec_b, cos_sim FROM (
      SELECT a.lid AS lid, a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND({_SQL_DOT.format(a='a.embedding', b='b.embedding')}
                   / ({_SQL_NORM.format(a='a.embedding')}
                      * {_SQL_NORM.format(a='b.embedding')}), 6) AS cos_sim
      FROM a1 a JOIN a1 b ON a.lid = b.lid AND a.vec_id < b.vec_id) p
    WHERE cos_sim >= 0.45
    """


@register(
    "v10_semantic_dedup",
    _v10_oracle(),
    doc="SemDeDup-style semantic near-duplicate pairs: cluster "
    "embeddings with the deterministic k-means (same replayable "
    "index build as v06), then compare pairs only WITHIN a cluster "
    "(rounded cosine >= 0.45). All-pairs is O(n^2); clustering cuts "
    "the candidate space to sum(cluster^2) — the standard embedding-"
    "dedup shape for a 100 TB corpus, where n_lists grows with n to "
    "keep clusters bounded. Pairs split across clusters are missed "
    "by construction (documented SemDeDup trade). r8: clusters above "
    "DEFAULT_MAX_BUCKET are dropped from the pair join — n_lists IS "
    "the scale knob (size it to n/target_cluster so clusters sit "
    "under the cap; n_lists*dim <= 1e7 per the IVF ceiling), and the "
    "cap turns a mis-sized n_lists into bounded work + reported "
    "dropped mass instead of a quadratic blowup (the r8 sf5 probe at "
    "n_lists=8 ran 625M in-cluster cosines past the 590s budget; "
    "capped, the worst case is 8 x 512²/2). No-op at gate SFs "
    "(largest cluster 275 at sf0.1 — oracle untouched).",
)
def v10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import DEFAULT_MAX_BUCKET, _cap_buckets
    from ice_spark.operators.ivf import assign_lists, train_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(
        emb, "embedding", n_lists=8, iterations=1, id_col="vec_id"
    )
    assigned = _cap_buckets(
        assign_lists(
            emb.select("vec_id", "embedding"), "embedding", cents
        ).select(F.col("__list").alias("lid"), "vec_id", "embedding"),
        ["lid"],
        DEFAULT_MAX_BUCKET,
    )
    a = assigned.select(
        "lid", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("__va")
    )
    b = assigned.select(
        "lid", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("__vb")
    )
    cos = F.round(cosine_fixed("__va", "__vb", 64), 6)
    return (
        a.join(b, "lid")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cos)
        .where(F.col("cos_sim") >= 0.45)
        .select("lid", "vec_a", "vec_b", "cos_sim")
    )


def _v11_oracle() -> str:
    # Full SQL replay of the PQ pipeline: shared seed rows (same
    # integer hash as v06/v10), per-subspace one-iteration Lloyd with
    # integer-microunit means, corpus encoding (argmin with kid
    # tie-break), and ADC scoring in integer microunits summed as
    # BIGINTs — every float comparison folds left-to-right in both
    # engines, every sum is exact.
    from ice_spark.operators.ivf import _SEED_HASH_MOD, _SEED_HASH_MULT

    M, K, DSUB = 8, 16, 8

    def dist_sub(vec: str, m: str, cent: str) -> str:
        # squared L2 between subspace m's slice of `vec` and centroid
        # list `cent`, folding dims left-to-right
        return (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(1, {DSUB}), i -> "
            f"(CAST({vec}[{m} * {DSUB} + i] AS DOUBLE) - {cent}[i]) * "
            f"(CAST({vec}[{m} * {DSUB} + i] AS DOUBLE) - {cent}[i]))), (x, y) -> x + y)"
        )

    return f"""
    WITH ms AS (SELECT UNNEST(generate_series(0, {M - 1})) AS m),
    seed AS (
      SELECT kid, embedding FROM (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (
                 ORDER BY ((vec_id % {_SEED_HASH_MOD}) * {_SEED_HASH_MULT}) % {_SEED_HASH_MOD}, vec_id
               ) - 1 AS kid
        FROM embeddings) t WHERE kid < {K}
    ),
    c0 AS (
      SELECT ms.m, seed.kid,
             list_transform(generate_series(1, {DSUB}),
                            i -> CAST(embedding[ms.m * {DSUB} + i] AS DOUBLE)) AS c
      FROM seed CROSS JOIN ms
    ),
    a0 AS (
      SELECT vec_id, m, kid FROM (
        SELECT e.vec_id, c0.m, c0.kid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, c0.m
                 ORDER BY {dist_sub('e.embedding', 'c0.m', 'c0.c')}, c0.kid
               ) AS rn
        FROM embeddings e CROSS JOIN c0) t WHERE rn = 1
    ),
    upd AS (
      SELECT a0.m, a0.kid, i.i AS dim,
             CAST(SUM(CAST(ROUND(
               CAST(e.embedding[a0.m * {DSUB} + i.i] AS DOUBLE) * 1e6) AS BIGINT))
               AS DOUBLE) / (COUNT(*) * 1e6) AS mval
      FROM a0 JOIN embeddings e USING (vec_id)
      CROSS JOIN (SELECT UNNEST(generate_series(1, {DSUB})) AS i) i
      GROUP BY a0.m, a0.kid, i.i
    ),
    c1 AS (
      SELECT c0.m, c0.kid, COALESCE(u.c, c0.c) AS c
      FROM c0 LEFT JOIN (
        SELECT m, kid, list(mval ORDER BY dim) AS c FROM upd GROUP BY m, kid) u
        ON u.m = c0.m AND u.kid = c0.kid
    ),
    enc AS (
      SELECT vec_id, m, kid FROM (
        SELECT e.vec_id, c1.m, c1.kid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, c1.m
                 ORDER BY {dist_sub('e.embedding', 'c1.m', 'c1.c')}, c1.kid
               ) AS rn
        FROM embeddings e CROSS JOIN c1) t WHERE rn = 1
    ),
    adc AS (
      SELECT q.vec_id AS query_id, enc.vec_id AS neighbor_id,
             SUM(CAST(ROUND({dist_sub('q.embedding', 'enc.m', 'c1.c')} * 1e6)
                      AS BIGINT)) AS adc_u
      FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
      JOIN enc ON q.vec_id <> enc.vec_id
      JOIN c1 ON c1.m = enc.m AND c1.kid = enc.kid
      GROUP BY q.vec_id, enc.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT query_id, neighbor_id,
             CAST(adc_u AS DOUBLE) / 1e6 AS adc_dist,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY adc_u, neighbor_id) AS INT) AS rank
      FROM adc) r WHERE rank <= 3
    """


@register(
    "v11_pq_adc_ann",
    _v11_oracle(),
    doc="Product-quantization ANN (Jegou et al. 2011): 8 subspaces x "
    "16 codewords = 4-byte codes per 64-dim vector (64x compression "
    "— the difference between vectors fitting in memory or not at "
    "100 TB), asymmetric-distance top-3 per query. Codebook "
    "training, encoding, and ADC ranking are all replayed by the "
    "oracle: shared integer-hash seeds, quantized Lloyd means, "
    "integer-microunit distance sums — bit-identical ranking across "
    "engines. Spark side is codebook literals + narrow per-row "
    "expressions; the only shuffle is the final per-query top-k.",
)
def v11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.pq import adc_topk, train_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_codebooks(
        emb, "vec_id", "embedding", m_subspaces=8, k_codes=16, dim=64, iterations=1
    )
    queries = emb.where(F.col("vec_id") < 5)
    return adc_topk(
        emb, queries, "vec_id", "embedding", "vec_id", "embedding",
        books, k=3, dim=64,
    )


def _v12_oracle() -> str:
    bucket = _sql_bucket
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, {bucket('embedding')} AS bq
      FROM embeddings WHERE vec_id < 20
    ),
    c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, {bucket('embedding')} AS bc
      FROM embeddings
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 ROUND({_SQL_DOT.format(a='qv', b='cv')}
                       / ({_SQL_NORM.format(a='qv')} * {_SQL_NORM.format(a='cv')}), 6)
                 DESC, neighbor_id) AS rk
        FROM q JOIN c ON query_id <> neighbor_id
      ) e WHERE rk <= 3
    ),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                 ROUND({_SQL_DOT.format(a='qv', b='cv')}
                       / ({_SQL_NORM.format(a='qv')} * {_SQL_NORM.format(a='cv')}), 6)
                 DESC, neighbor_id) AS rk
        FROM q JOIN c ON bq = bc AND query_id <> neighbor_id
      ) e WHERE rk <= 3
    )
    SELECT e.query_id,
           COUNT(l.neighbor_id) AS n_hits,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           ROUND(CAST(COUNT(l.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall
    FROM exact e
    LEFT JOIN lsh l
      ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
    GROUP BY e.query_id
    """


@register(
    "v12_ann_recall_audit",
    _v12_oracle(),
    doc="Index-quality audit: recall@3 of the hyperplane-LSH ANN "
    "against exact brute-force cosine, per query vector — the "
    "measurement a pipeline runs before trusting an approximate "
    "index at scale. Both retrievals broadcast the bounded query "
    "side; the audit join is on (query, neighbor) ids only. The "
    "oracle replays BOTH retrievals including the inlined hyperplane "
    "bucket assignment.",
)
def v12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    kw = dict(
        corpus=emb,
        queries=queries,
        id_col="vec_id",
        vec_col="embedding",
        query_id_col="vec_id",
        query_vec_col="embedding",
        k=3,
    )
    exact = brute_force_topk(dim=64, **kw).select("query_id", "neighbor_id")
    lsh = lsh_topk(dim=64, n_planes=6, **kw).select(
        F.col("query_id").alias("l_qid"), F.col("neighbor_id").alias("l_nid")
    )
    audited = exact.join(
        lsh,
        (exact.query_id == lsh.l_qid) & (exact.neighbor_id == lsh.l_nid),
        "left_outer",
    )
    return audited.groupBy("query_id").agg(
        F.count("l_nid").alias("n_hits"),
        F.count(F.lit(1)).alias("n_exact"),
        F.round(F.count("l_nid").cast("double") / F.count(F.lit(1)), 6).alias(
            "recall"
        ),
    )


def _v13_oracle(n_cand: int = 8, k: int = 4) -> str:
    cos = (
        f"ROUND({_SQL_DOT.format(a='qv', b='cv')}"
        f" / ({_SQL_NORM.format(a='qv')} * {_SQL_NORM.format(a='cv')}), 6)"
    )
    pcos = (
        f"ROUND({_SQL_DOT.format(a='ea.embedding', b='eb.embedding')}"
        f" / ({_SQL_NORM.format(a='ea.embedding')}"
        f" * {_SQL_NORM.format(a='eb.embedding')}), 6)"
    )
    steps = []
    for t in range(2, k + 1):
        p = t - 1
        steps.append(f"""
    rem{t} AS (
      SELECT c.* FROM cand c
      LEFT JOIN selected{p} s ON c.query_id = s.query_id AND c.cid = s.cid
      WHERE s.cid IS NULL
    ),
    ms{t} AS (
      SELECT r.query_id, r.cid, r.rel_u, MAX(p.sim_u) AS maxsim
      FROM rem{t} r
      JOIN pair p ON p.query_id = r.query_id AND p.ca = r.cid
      JOIN selected{p} s ON s.query_id = p.query_id AND s.cid = p.cb
      GROUP BY 1, 2, 3
    ),
    sel{t} AS (
      SELECT query_id, cid, rel_u, rel_u - maxsim AS mmr_u, {t} AS position
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY rel_u - maxsim DESC, cid) AS rn
            FROM ms{t})
      WHERE rn = 1
    ),
    selected{t} AS (SELECT * FROM selected{p} UNION ALL SELECT * FROM sel{t})""")
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT query_id, e.vec_id AS cid,
             CAST(ROUND({cos} * 1e6) AS BIGINT) AS rel_u
      FROM q JOIN (SELECT vec_id, embedding AS cv FROM embeddings) e
        ON e.vec_id <> query_id
    ),
    cand AS (
      SELECT query_id, cid, rel_u
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY rel_u DESC, cid) AS rn FROM scored)
      WHERE rn <= {n_cand}
    ),
    pair AS (
      SELECT a.query_id, a.cid AS ca, b.cid AS cb,
             CAST(ROUND({pcos} * 1e6) AS BIGINT) AS sim_u
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.cid <> b.cid
      JOIN embeddings ea ON ea.vec_id = a.cid
      JOIN embeddings eb ON eb.vec_id = b.cid
    ),
    selected1 AS (
      SELECT query_id, cid, rel_u, rel_u AS mmr_u, 1 AS position
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY rel_u DESC, cid) AS rn FROM cand)
      WHERE rn = 1
    ),{",".join(steps)}
    SELECT query_id, CAST(position AS INT) AS position, cid AS vec_id,
           rel_u, mmr_u
    FROM selected{k}
    ORDER BY query_id, position
    """


@register(
    "v13_mmr_rerank",
    _v13_oracle(),
    doc="Maximal-marginal-relevance diversity re-ranking: retrieve "
    "top-8 candidates per query by exact cosine, then greedily pick 4 "
    "balancing relevance against similarity to already-picked results "
    "(lambda=0.5, integer micro-unit scores: rank by rel_u - "
    "max_sim_u, the scale-cleared MMR objective). The diversity pass "
    "a training-data sampler or RAG retriever runs after ANN. Scale "
    "shape: MMR sees only queries x 8 candidates and queries x 64 "
    "pairs — bounded per query, independent of corpus size; the k "
    "greedy steps are unrolled DataFrame joins, nothing collected. "
    "All selection comparisons are BIGINT, ties on id — both engines "
    "replay the greedy walk exactly.",
)
def v13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    topk = brute_force_topk(
        corpus=emb,
        queries=queries,
        id_col="vec_id",
        vec_col="embedding",
        dim=64,
        query_id_col="vec_id",
        query_vec_col="embedding",
        k=8,
    )
    # Lazy localCheckpoint BEFORE deriving `pair`: pair references cand
    # twice (ca/cb sides) and mmr_rerank consumes it again, so without
    # this the brute-force corpus scan + cosine subtree evaluates up to
    # 3x per run (sf0.1 noop 5-rep median 2.309 -> 2.054s; sf1 3.158 ->
    # 3.016s). mmr_rerank's own checkpoint then wraps this tiny RDD.
    cand = topk.select(
        "query_id",
        F.col("neighbor_id").alias("cid"),
        F.round(F.col("cos_sim") * 1e6).cast("long").alias("rel_u"),
    ).localCheckpoint(eager=False)
    ea = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("av"))
    eb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("bv"))
    ca = cand.select("query_id", F.col("cid").alias("ca"))
    cb = cand.select(F.col("query_id").alias("qb"), F.col("cid").alias("cb"))
    pair = (
        ca.join(cb, (ca.query_id == cb.qb) & (F.col("ca") != F.col("cb")))
        .join(ea, F.col("ca") == F.col("a_id"))
        .join(eb, F.col("cb") == F.col("b_id"))
        .select(
            "query_id",
            "ca",
            "cb",
            F.round(F.round(cosine_fixed("av", "bv", 64), 6) * 1e6)
            .cast("long")
            .alias("sim_u"),
        )
    )
    out = mmr_rerank(cand, pair, k=4)
    return out.select(
        "query_id",
        F.col("position").cast("int").alias("position"),
        F.col("cid").alias("vec_id"),
        "rel_u",
        "mmr_u",
    ).orderBy("query_id", "position")


@register(
    "v14_vector_analogy",
    f"""
    WITH ids AS (SELECT UNNEST([0, 1, 2]) AS q),
    trip AS (
      SELECT q, ea.embedding AS va, eb.embedding AS vb, ec.embedding AS vc
      FROM ids
      JOIN embeddings ea ON ea.vec_id = q
      JOIN embeddings eb ON eb.vec_id = q + 5
      JOIN embeddings ec ON ec.vec_id = q + 10
    ),
    tgt AS (
      SELECT q,
             list_transform(generate_series(1, len(va)),
               i -> CAST(va[i] AS DOUBLE) - CAST(vb[i] AS DOUBLE)
                    + CAST(vc[i] AS DOUBLE)) AS tv
      FROM trip
    ),
    scored AS (
      SELECT q, e.vec_id AS neighbor_id,
             ROUND({_SQL_DOT.format(a='tv', b='e.embedding')}
                   / ({_SQL_NORM.format(a='tv')}
                      * {_SQL_NORM.format(a='e.embedding')}), 6) AS cos_sim
      FROM tgt JOIN embeddings e
        ON e.vec_id NOT IN (q, q + 5, q + 10)
    )
    SELECT q AS query_id, neighbor_id, cos_sim, rank FROM (
      SELECT q, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY q
               ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      FROM scored
    ) r WHERE rank <= 3
    """,
    doc="Embedding-arithmetic analogy search (the word2vec a - b + c "
    "pattern): per query triple, the target vector is composed "
    "element-wise and matched against the corpus by exact cosine, "
    "top-3 with round-6 + id tiebreaks (v01's determinism "
    "discipline). Targets are a broadcast handful of rows; the "
    "corpus is scanned once — the composition adds zero shuffles "
    "over plain kNN, which is the point: analogy queries at 100 TB "
    "cost exactly what retrieval costs.",
)
def v14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.similarity import cosine_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    ids = spark.range(3).select(F.col("id").cast("long").alias("q"))
    ea = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    ec = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vc"))
    trip = (
        ids.join(ea, F.col("q") == F.col("a_id"))
        .join(eb, F.col("q") + 5 == F.col("b_id"))
        .join(ec, F.col("q") + 10 == F.col("c_id"))
    )
    tv = F.zip_with(
        F.zip_with("va", "vb", lambda a, b: a.cast("double") - b.cast("double")),
        "vc",
        lambda ab, c: ab + c.cast("double"),
    )
    tgt = trip.select("q", tv.alias("tv"))
    scored = (
        emb.join(
            F.broadcast(tgt),
            (F.col("vec_id") != F.col("q"))
            & (F.col("vec_id") != F.col("q") + 5)
            & (F.col("vec_id") != F.col("q") + 10),
        )
        .select(
            F.col("q").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_fixed("tv", "embedding", 64), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@register(
    "v15_centroid_classifier_audit",
    """
    WITH vecs AS (
      SELECT vec_id, label AS true_label, i,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v_u
      FROM embeddings, generate_series(1, 64) t(i)
    ),
    cent AS (
      -- centroid of the QUANTIZED components, rounded half-away with
      -- pure integer arithmetic: sign * ((2|s| + n) // (2n))
      SELECT true_label AS label, i,
             CASE WHEN SUM(v_u) >= 0
                  THEN (2 * SUM(v_u) + COUNT(*)) // (2 * COUNT(*))
                  ELSE -((2 * (-SUM(v_u)) + COUNT(*)) // (2 * COUNT(*)))
             END AS c_u
      FROM vecs
      GROUP BY 1, 2
    ),
    dist AS (
      SELECT v.vec_id, v.true_label, c.label AS cand,
             SUM((v.v_u - c.c_u) * (v.v_u - c.c_u)) AS d2
      FROM vecs v JOIN cent c ON c.i = v.i
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT vec_id, true_label, cand AS pred_label
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY d2, cand) AS rn FROM dist)
      WHERE rn = 1
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred
    GROUP BY 1, 2
    ORDER BY true_label, pred_label
    """,
    doc="Nearest-centroid classifier audit: per-label centroids "
    "(components quantized to integer 1e-4 units FIRST, then the "
    "mean taken with a portable half-away integer rounded division — "
    "zero float arithmetic anywhere after quantization), every vector "
    "assigned to its nearest centroid by integer squared distance "
    "with label tiebreak, rolled into the label x prediction "
    "confusion matrix — the embedding-quality eval a labeling "
    "pipeline runs after training. Centroids are labels x dims rows "
    "(broadcastable at any corpus size); the distance join streams "
    "the corpus once.",
)
def v15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.posexplode("embedding").alias("i0", "v"),
    ).select(
        "vec_id",
        "true_label",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("v").cast("double") * 10000).cast("long").alias("v_u"),
    ).cache()
    cent = (
        ex.groupBy(F.col("true_label").alias("label"), "i")
        .agg(F.sum("v_u").alias("s"), F.count(F.lit(1)).alias("nl"))
        .select(
            "label",
            "i",
            F.expr(
                "CASE WHEN s >= 0 THEN (2 * s + nl) div (2 * nl) "
                "ELSE -((2 * (-s) + nl) div (2 * nl)) END"
            ).alias("c_u"),
        )
    )
    dist = (
        ex.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "true_label", F.col("label").alias("cand"))
        .agg(F.sum((F.col("v_u") - F.col("c_u")) * (F.col("v_u") - F.col("c_u"))).alias("d2"))
    )
    w = W.partitionBy("vec_id").orderBy("d2", "cand")
    pred = (
        dist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("true_label", F.col("cand").alias("pred_label"))
    )
    return (
        pred.groupBy(
            F.col("true_label").cast("long").alias("true_label"),
            F.col("pred_label").cast("long").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "pred_label")
    )


def _v16_oracle() -> str:
    parts = []
    for bits, qmax in ((8, 127), (4, 7), (2, 1)):
        scale = (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))), "
            f"(a, b) -> greatest(a, b)) / {qmax}"
        )
        mae = (
            "CASE WHEN s = 0 THEN CAST(0 AS DOUBLE) ELSE "
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(embedding, v -> "
            "abs(CAST(v AS DOUBLE) - round(CAST(v AS DOUBLE) / s) * s))), "
            "(a, b) -> a + b) / len(embedding) END"
        )
        parts.append(f"""
    SELECT {bits} AS bits,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(mae_u) AS BIGINT) AS total_mae_u,
           CAST(SUM(mae_u) AS BIGINT) // COUNT(*) AS avg_mae_u,
           CAST(MAX(mae_u) AS BIGINT) AS max_mae_u
    FROM (
      SELECT CAST(ROUND(({mae}) * 1e6) AS BIGINT) AS mae_u
      FROM (SELECT embedding, {scale} AS s FROM embeddings)
    )""")
    return " UNION ALL ".join(parts) + " ORDER BY bits"


@register(
    "v16_quantization_sweep",
    _v16_oracle(),
    doc="Quantization error curve across int8 / int4 / int2 "
    "(symmetric per-vector absmax scaling, the v07 recipe swept over "
    "bit widths): mean-abs reconstruction error quantized to integer "
    "micro-units per vector before any cross-row aggregation, so the "
    "curve hashes identically in both engines. The bits-vs-quality "
    "trade a 100 TB embedding store prices before committing to a "
    "storage format; each branch is one map-only pass, three scans "
    "total, output is 3 rows.",
)
def v16(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    outs = []
    for bits, qmax in ((8, 127), (4, 7), (2, 1)):
        scale = (
            "aggregate(embedding, CAST(0 AS DOUBLE), "
            f"(a, v) -> greatest(a, abs(CAST(v AS DOUBLE)))) / {qmax}"
        )
        mae = (
            "CASE WHEN s = 0D THEN 0D ELSE "
            "aggregate(embedding, CAST(0 AS DOUBLE), "
            "(a, v) -> a + abs(CAST(v AS DOUBLE) - round(CAST(v AS DOUBLE) / s) * s))"
            " / size(embedding) END"
        )
        per_vec = emb.select(F.expr(scale).alias("s"), "embedding").select(
            F.expr(f"CAST(ROUND(({mae}) * 1e6) AS BIGINT)").alias("mae_u")
        )
        outs.append(
            per_vec.agg(
                F.lit(bits).alias("bits"),
                F.count(F.lit(1)).alias("n_vecs"),
                F.sum("mae_u").cast("long").alias("total_mae_u"),
                F.expr("CAST(sum(mae_u) AS BIGINT) div count(*)").alias("avg_mae_u"),
                F.max("mae_u").alias("max_mae_u"),
            ).select("bits", "n_vecs", "total_mae_u", "avg_mae_u", "max_mae_u")
        )
    return outs[0].unionAll(outs[1]).unionAll(outs[2]).orderBy("bits")


@register(
    "v17_embedding_space_audit",
    """
    WITH comp AS (
      SELECT i, CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS v_u
      FROM embeddings, generate_series(1, 64) t(i)
    ),
    agg AS (
      SELECT i,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v_u) AS BIGINT) AS s,
             CAST(SUM(v_u * v_u) AS BIGINT) AS q,
             CAST(COUNT(*) FILTER (WHERE ABS(v_u) > 30000) AS BIGINT) AS n_extreme
      FROM comp GROUP BY i
    )
    SELECT CAST(i AS BIGINT) AS dim,
           n AS n_vecs,
           CAST(s AS DOUBLE) / CAST(n * 10000 AS DOUBLE) AS mean,
           (CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             / CAST(100000000 AS DOUBLE) AS variance,
           SQRT(CAST(q AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(10000 AS DOUBLE) AS rms,
           n_extreme,
           CAST(CASE WHEN (CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                          / CAST(100000000 AS DOUBLE)
                          < CAST(1 AS DOUBLE) / CAST(10000 AS DOUBLE)
                     THEN 1 ELSE 0 END AS BIGINT) AS dead
    FROM agg
    ORDER BY dim
    """,
    doc="Embedding-space health audit: per-dimension first/second "
    "moments of the corpus embedding matrix — mean (the per-dim "
    "contribution to the anisotropy bias ||mu||^2 / E||x||^2, "
    "Ethayarajh 2019's degenerate-direction diagnostic), variance "
    "with a dead-dimension flag (var < 1e-4 — a collapsed dimension "
    "wastes IVF/PQ codebook capacity downstream, v06/v11's inputs), "
    "RMS, and an extreme-value count (|v| > 3.0 — embedding-export "
    "corruption shows up here first). Components quantize to exact "
    "1e-4 integer units before summing (the t08/v15 rule); every "
    "exposed double is a fixed single-path expression over those "
    "exact BIGINTs, so Spark and DuckDB agree bitwise. Shape at "
    "100 TB: one posexplode + one 64-key hash agg — pure map-side "
    "combine into 64 rows, no joins, no windows. Exact-integer "
    "ceiling: SUM(v_u^2) stays in BIGINT up to ~5e9 vectors per dim "
    "at unit-scale components; beyond that, shard the agg or drop "
    "to 1e-2 units (documented, same class as the IVF centroid "
    "literal ceiling).",
)
def v17(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(F.posexplode("embedding").alias("i0", "v")).select(
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("v").cast("double") * 10000).cast("long").alias("v_u"),
    )
    agg = comp.groupBy("i").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_u").cast("long").alias("s"),
        F.sum(F.col("v_u") * F.col("v_u")).cast("long").alias("q"),
        F.sum(F.when(F.abs(F.col("v_u")) > 30000, 1).otherwise(0))
        .cast("long")
        .alias("n_extreme"),
    )
    var_sql = (
        "(CAST(q AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
        "* (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) "
        "/ CAST(100000000 AS DOUBLE)"
    )
    return agg.select(
        F.col("i").cast("long").alias("dim"),
        F.col("n").alias("n_vecs"),
        F.expr("CAST(s AS DOUBLE) / CAST(n * 10000 AS DOUBLE)").alias("mean"),
        F.expr(var_sql).alias("variance"),
        F.expr(
            "SQRT(CAST(q AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(10000 AS DOUBLE)"
        ).alias("rms"),
        "n_extreme",
        F.expr(
            f"CAST(CASE WHEN {var_sql} < CAST(1 AS DOUBLE) / CAST(10000 AS DOUBLE) "
            "THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("dead"),
    ).orderBy("dim")
