"""Text-analysis and dedup queries over the `documents` table.

Spark side uses ice_spark.functions.text (pure Column expressions —
whole-stage codegen, no Python UDFs). Oracles reproduce the portable
hash spec (functions/text.py docstring) with DuckDB list lambdas.

Scale notes: every query here is a single scan + narrow per-row array
expressions + one aggregation; the pair-finding queries bound the
candidate space (same-source blocking / LSH banding) instead of a
quadratic self-join.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 - needed to resolve pandas_udf type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.functions import text as T
from ice_spark.queries.registry import register
from ice_spark.tables import load_table

# --- Shared DuckDB SQL fragments (mirror functions/text.py exactly) ---

_SQL_TOKS = r"list_filter(string_split_regex(trim({col}), '\s+'), t -> t <> '')"

_SQL_CHAR_HASH = (
    "list_reduce(list_prepend(CAST(7 AS BIGINT), "
    "list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(a, b) -> (a * 131 + b) % 1000000007)"
)

# token-hash array over toks (mirrors functions.text.char_hash per token)
_SQL_TOKH = (
    "list_transform(toks, t -> "
    "list_reduce(list_prepend(CAST(7 AS BIGINT), "
    "list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(a, b) -> (a * 131 + b) % 1000000007))"
)

# shingle hashes from token hashes (mirrors functions.text.shingle_hashes)
_SQL_SHINGLE_HASHES = (
    "CASE WHEN len(th) >= 3 THEN "
    "list_distinct(list_transform(generate_series(1, len(th)-2), "
    "i -> ((((7 * 1000003 + th[i]) % 1000000007) * 1000003 + th[i+1]) % 1000000007"
    " * 1000003 + th[i+2]) % 1000000007)) "
    "ELSE [list_reduce(list_prepend(CAST(7 AS BIGINT), th), "
    "(a, b) -> (a * 1000003 + b) % 1000000007)] END"
)


def _sql_lang_score(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
    return f"len(list_filter(ltoks, t -> list_contains([{markers}], t)))"


@register(
    "t01_token_stats",
    f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM (
      SELECT lang, n_chars, len({_SQL_TOKS.format(col='text')}) AS n_tokens
      FROM documents
    ) d
    GROUP BY lang
    """,
    doc="Token counting per language (whitespace tokenizer).",
)
def t01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("lang", "n_chars", T.token_count("text").alias("n_tokens"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@register(
    "t02_quality_scores",
    f"""
    WITH d AS (
      SELECT source, toks,
             len(toks) AS n_tokens,
             len(list_filter(list_transform(toks, t -> lower(t)),
                 t -> list_contains([{", ".join(f"'{w}'" for w in T.EN_STOPWORDS)}], t)))
               AS sw_hits,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(toks, t -> CAST(length(t) AS BIGINT))),
                 (a, b) -> a + b) AS tok_chars
      FROM (SELECT source, {_SQL_TOKS.format(col='text')} AS toks FROM documents)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(CAST(sw_hits AS DOUBLE) / GREATEST(n_tokens, 1)), 4)
             AS avg_stopword_ratio,
           ROUND(AVG(CAST(tok_chars AS DOUBLE) / GREATEST(n_tokens, 1)), 4)
             AS avg_token_len,
           COUNT(*) FILTER (WHERE n_tokens >= 20
                            AND CAST(sw_hits AS DOUBLE) / GREATEST(n_tokens, 1) >= 0.02)
             AS n_quality
    FROM d
    GROUP BY source
    """,
    doc="Quality scoring: stopword ratio, mean token length, quality gate "
    "counts per source.",
)
def t02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        T.token_count("text").alias("n_tokens"),
        T.stopword_ratio("text").alias("sw_ratio"),
        T.mean_token_len("text").alias("tok_len"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("sw_ratio"), 4).alias("avg_stopword_ratio"),
        F.round(F.avg("tok_len"), 4).alias("avg_token_len"),
        F.sum(
            F.when((F.col("n_tokens") >= 20) & (F.col("sw_ratio") >= 0.02), 1).otherwise(0)
        ).alias("n_quality"),
    )


@register(
    "t03_langid_confusion",
    f"""
    WITH scored AS (
      SELECT lang,
             {_sql_lang_score('en')} AS s_en,
             {_sql_lang_score('de')} AS s_de,
             {_sql_lang_score('es')} AS s_es,
             {_sql_lang_score('fr')} AS s_fr,
             {_sql_lang_score('zh')} AS s_zh
      FROM (SELECT lang,
                   list_transform({_SQL_TOKS.format(col='text')}, t -> lower(t)) AS ltoks
            FROM documents)
    )
    SELECT lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END AS predicted,
           COUNT(*) AS n
    FROM scored
    GROUP BY 1, 2
    """,
    doc="Language-ID heuristic (stopword marker voting) vs labeled lang.",
)
def t03(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.predict_lang("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "t04_fingerprints",
    f"""
    SELECT doc_id, {_SQL_CHAR_HASH.format(s='text')} AS fingerprint
    FROM documents
    """,
    doc="Per-document rolling-hash fingerprint (portable polynomial hash).",
)
def t04(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.char_hash_arrow("text").alias("fingerprint"))


@register(
    "d01_exact_dedup",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_unique,
           COUNT(*) - COUNT(DISTINCT text) AS n_dupes
    FROM documents
    GROUP BY source
    """,
    doc="Exact dedup accounting per source (hash-groupBy; the acting "
    "dedup operator is ice_spark.operators.dedup.exact_dedup).",
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_dupes"),
    )


@register(
    "d02_ngram_jaccard_pairs",
    f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS sh
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents))
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs)
    SELECT doc_a, doc_b,
           ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
    """,
    doc="Exact n-gram Jaccard near-dup pairs (J >= 0.8) via shingle-hash "
    "inverted index — explode + join on 8-byte hashes (not strings), "
    "never a quadratic cross join. Posting lists are capped at "
    "DEFAULT_MAX_POSTING (one hot shingle shared by p docs is p²/2 "
    "pairs under a single join key); the cap never triggers at test "
    "SF (max posting ~25 at sf0.1), so results equal the uncapped "
    "oracle — d17_dropped_posting_mass is the gated audit that "
    "makes the dropped mass a visible output at scale.",
)
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import cap_postings

    # Shingle arrays feed FOUR consumers (sizes twice via sa/sb, both
    # explode sides); the lazy localCheckpoint computes the char-walk
    # hashing once and every consumer scans the materialized blocks
    # (same shape as operators/dedup.minhash_lsh_pairs).
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", T.shingle_hashes("text").alias("sh"))
        .localCheckpoint(eager=False)
    )
    # The window count shuffles on s — the same key the candidate
    # self-join hashes on, so the exchange is shared downstream.
    # Uncapped per-doc set sizes RIDE the posting explode as one int
    # per posting row and come back out of the pair aggregate via
    # max() (functionally dependent on the group key) — the two size
    # joins that previously re-attached them to the pair set are gone
    # (r13-opt: sf1 21.3 -> 17.6 s, 5/5 interleaved pairs; costs
    # ~0.1 s at sf0.1 where AQE made the joins broadcasts, the
    # documented growing-relation hazard at corpus scale).
    ex = cap_postings(
        docs.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")),
        ["s"],
    )
    ex2 = ex.select(
        F.col("doc_id").alias("doc_b_id"), F.col("n").alias("n2"), F.col("s").alias("s2")
    )
    pairs = (
        ex.join(ex2, (ex.s == ex2.s2) & (ex.doc_id < ex2.doc_b_id))
        .groupBy(F.col("doc_id").alias("doc_a"), F.col("doc_b_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("n").alias("na"),
            F.max("n2").alias("nb"),
        )
    )
    jacc = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.where(jacc >= 0.8)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


_SQL_MINHASH_SIG = (
    "list_transform(shs, h -> (h * {a} + {b}) % 1000000007)"
)


@register(
    "d03_minhash_signatures",
    f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS shs
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents))
    )
    SELECT doc_id,
           list_min({_SQL_MINHASH_SIG.format(a=3, b=1)}) AS mh0,
           list_min({_SQL_MINHASH_SIG.format(a=5, b=8)}) AS mh1,
           list_min({_SQL_MINHASH_SIG.format(a=7, b=15)}) AS mh2,
           list_min({_SQL_MINHASH_SIG.format(a=9, b=22)}) AS mh3
    FROM docs
    """,
    doc="MinHash signatures (4 portable permutations over shingle hashes) "
    "— proves the MinHash layer bit-exactly; LSH banding on top is "
    "d04 (rows-only).",
)
def d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One Arrow pass (tokenize + shingle + 4 mins in numpy) shipping
    # 4 longs per doc — bit-identical to operators/dedup.
    # minhash_signatures' explode + groupBy-min (pinned by
    # tests/test_text_np.py), with no shingle array over the Python
    # boundary and no groupBy exchange. The kernel is adopted ONLY
    # where the signature IS the terminal result: inside the LSH
    # pipelines (d04/d11/s13) the exploded aggregate's output
    # partitioning feeds the band stage and the kernel form measured
    # SLOWER there (r13-opt A/B, rejected list); here it wins 3/3
    # sf0.1 pairs and 2/3 sf1 (0.42-0.72 vs 0.80-1.45 s sf0.1).
    docs = load_table(spark, sf_dir, "documents")
    sig = T.minhash_sigs_arrow("text", n=3, k=4)
    return docs.select("doc_id", sig.alias("__sig")).select(
        "doc_id", *[F.col("__sig").getItem(j).alias(f"mh{j}") for j in range(4)]
    )


def _d04_oracle() -> str:
    # 16 portable permutations (h*(2j+3)+(7j+1)) % MOD, 8 bands of 2:
    # the exact spec of operators/dedup.minhash_signatures, so the
    # oracle reproduces banding bit-for-bit.
    sig = ", ".join(
        f"list_min(list_transform(shs, h -> (h * {2 * j + 3} + {7 * j + 1}) "
        f"% 1000000007))"
        for j in range(16)
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS shs
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks
                  FROM documents))
    ),
    sig AS (SELECT doc_id, shs, [{sig}] AS mh FROM docs),
    bk AS (
      SELECT doc_id, b,
             CAST(mh[2 * b + 1] AS VARCHAR) || '_' ||
             CAST(mh[2 * b + 2] AS VARCHAR) AS key
      FROM sig, generate_series(0, 7) t(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bk x JOIN bk y
        ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
    ),
    ver AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE) /
             (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs)))
               AS j
      FROM cand
      JOIN docs da ON da.doc_id = cand.doc_a
      JOIN docs db ON db.doc_id = cand.doc_b
    )
    SELECT doc_a, doc_b, ROUND(j, 6) AS jaccard FROM ver WHERE j >= 0.8
    """


@register(
    "d04_minhash_lsh_pairs",
    _d04_oracle(),
    doc="Full MinHash+LSH near-dup pipeline: 16 permutations, 8 bands → "
    "band-bucket join → exact Jaccard verify >= 0.8. Scales as "
    "O(candidates), not O(n^2). The oracle replays the identical "
    "portable permutation/banding spec in DuckDB.",
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, id_col="doc_id", text_col="text", n_hashes=16, bands=8, threshold=0.8
    )


_SQL_SIMHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(0, 31), b -> "
    "CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(th, h -> CASE WHEN (h >> b) & 1 = 1 "
    "THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)), "
    "(x, y) -> x + y) > 0 THEN CAST(1 AS BIGINT) << b "
    "ELSE CAST(0 AS BIGINT) END)), (a, c) -> a + c)"
)


@register(
    "d05_simhash_buckets",
    f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKH} AS th
      FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents)
    ),
    sh AS (SELECT doc_id, {_SQL_SIMHASH} AS simhash FROM t)
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc
    FROM sh
    GROUP BY simhash
    HAVING COUNT(*) >= 2
    """,
    doc="SimHash values + bucket histogram: docs sharing a simhash are "
    "near-dup candidates in O(n) space. Oracle replays the 32-bit "
    "vote fold with the same portable token hashes.",
)
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", T.simhash("text").alias("simhash"))
    return (
        sh.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc"))
        .where(F.col("n_docs") >= 2)
    )


_SQL_NEARDUP_EDGES = f"""
    docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS sh
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents))
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    pairs AS (
      SELECT doc_a, doc_b FROM prs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
    )
"""


@register(
    "d06_neardup_clusters",
    f"""
    WITH RECURSIVE
    {_SQL_NEARDUP_EDGES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
    FROM reach GROUP BY u
    ORDER BY doc_id
    """,
    doc="Near-dup clusters: connected components over the exact-Jaccard "
    "pair graph (J >= 0.8) via alternating large-star/small-star "
    "(operators/cluster.py) — O(log^2 n) rounds independent of "
    "component diameter, each round a pair of shuffles. The oracle is "
    "DuckDB's recursive transitive closure (fine at oracle SF; the "
    "Spark path is the one that scales).",
)
def d06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.cluster import alternating_star_components
    from ice_spark.queries.registry import QUERIES

    pairs = QUERIES["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    comp = alternating_star_components(pairs, "doc_a", "doc_b")
    return comp.select(F.col("node").alias("doc_id"), "component").orderBy("doc_id")


@register(
    "d09_canonical_selection",
    f"""
    WITH RECURSIVE
    {_SQL_NEARDUP_EDGES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
      FROM reach GROUP BY u
    ),
    scored AS (
      SELECT c.component, c.doc_id,
             len({_SQL_TOKS.format(col='d.text')}) AS n_toks,
             ROW_NUMBER() OVER (
               PARTITION BY c.component
               ORDER BY len({_SQL_TOKS.format(col='d.text')}) DESC, c.doc_id ASC
             ) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT component,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
           MAX(CASE WHEN rn = 1 THEN n_toks END) AS kept_toks,
           COUNT(*) AS n_members,
           COUNT(*) - 1 AS n_dropped
    FROM scored
    GROUP BY component
    ORDER BY component
    """,
    doc="Canonical selection after near-dup clustering: within each "
    "connected component keep the LONGEST document (ties -> lowest "
    "id) and drop the rest — the keep-best policy real dedup "
    "pipelines apply instead of keep-min-id. Composition of the CC "
    "operator with a per-component window; scales as d06 plus one "
    "narrow shuffle on component id.",
)
def d09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ice_spark.operators.cluster import alternating_star_components
    from ice_spark.queries.registry import QUERIES

    pairs = QUERIES["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    comp = alternating_star_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").alias("n_toks")
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_toks"), F.asc("doc_id"))
    scored = comp.join(docs, "doc_id").withColumn("rn", F.row_number().over(w))
    return (
        scored.groupBy("component")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
            F.max(F.when(F.col("rn") == 1, F.col("n_toks"))).alias("kept_toks"),
            F.count(F.lit(1)).alias("n_members"),
            (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
        )
        .orderBy("component")
    )


@register(
    "s08_mixture_weights",
    """
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n) AS t FROM counts),
    target AS (
      SELECT lang, n, t,
             CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.2
                       WHEN 'fr' THEN 0.1 WHEN 'de' THEN 0.1
                       ELSE 0.1 END AS DOUBLE) AS target_w
      FROM counts, tot
    )
    SELECT lang,
           n AS n_docs,
           target_w,
           ROUND(LEAST(CAST(1.0 AS DOUBLE),
                       target_w * t / n), 6) AS keep_rate,
           CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE), target_w * t / n) * n)
                AS BIGINT) AS expected_kept
    FROM target
    ORDER BY lang
    """,
    doc="Data-mixture solver: given target language weights, compute "
    "per-stratum deterministic keep rates (capped at 1 — an "
    "under-represented stratum is kept whole, the classic mixture "
    "rebalancing constraint) and expected post-sampling sizes. "
    "Aggregation is one tiny shuffle; the rates feed "
    "operators/sampling.stratified_hash_sample for the actual "
    "materialization.",
)
def s08(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("t"))
    target = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "target_w",
            F.when(F.col("lang") == "en", F.lit(0.5))
            .when(F.col("lang") == "es", F.lit(0.2))
            .when(F.col("lang") == "fr", F.lit(0.1))
            .when(F.col("lang") == "de", F.lit(0.1))
            .otherwise(F.lit(0.1)),
        )
        .withColumn(
            "keep_rate",
            F.round(
                F.least(
                    F.lit(1.0).cast("double"),
                    F.col("target_w") * F.col("t") / F.col("n_docs"),
                ),
                6,
            ),
        )
        .withColumn(
            "expected_kept",
            F.floor(
                F.least(
                    F.lit(1.0).cast("double"),
                    F.col("target_w") * F.col("t") / F.col("n_docs"),
                )
                * F.col("n_docs")
            ).cast("long"),
        )
    )
    return target.select(
        "lang", "n_docs", "target_w", "keep_rate", "expected_kept"
    ).orderBy("lang")


@register(
    "t05_bpe_token_counts",
    r"""
    SELECT lang,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_bpe) AS DOUBLE) / COUNT(*) AS avg_bpe_tokens,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 4) AS bpe_to_ws_ratio
    FROM (
      SELECT lang,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 	
]+')) AS n_bpe,
             len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS n_ws
      FROM documents
    ) d
    GROUP BY lang
    """,
    doc="BPE-ish regex tokenization (letter runs / digit runs / "
    "punctuation runs) vs whitespace tokens, per language.",
)
def t05(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(
            F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]+', 0)")
        ).alias("n_bpe"),
        T.token_count("text").alias("n_ws"),
    )
    return d.groupBy("lang").agg(
        F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        (F.sum("n_bpe").cast("double") / F.count(F.lit(1))).alias("avg_bpe_tokens"),
        F.sum("n_ws").cast("long").alias("total_ws_tokens"),
        F.round(F.sum("n_bpe").cast("double") / F.sum("n_ws"), 4).alias("bpe_to_ws_ratio"),
    )


@register(
    "p01_clean_corpus_pipeline",
    f"""
    WITH keep AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
    ),
    scored AS (
      SELECT d.lang, len(toks) AS n_tokens,
             len(list_filter(list_transform(toks, t -> lower(t)),
                 t -> list_contains([{", ".join(f"'{w}'" for w in T.EN_STOPWORDS)}], t)))
               AS sw_hits
      FROM (SELECT doc_id, lang, {_SQL_TOKS.format(col='text')} AS toks
            FROM documents) d
      JOIN keep ON d.doc_id = keep.doc_id
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE n_tokens >= 20
                            AND CAST(sw_hits AS DOUBLE) / GREATEST(n_tokens, 1) >= 0.02)
             AS n_clean,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM scored
    GROUP BY lang
    """,
    doc="Composed training-data cleaning pipeline: exact dedup (keep "
    "min doc_id per text) -> quality gate -> per-language corpus "
    "stats. One declarative plan; each stage is the operator users "
    "compose at 100 TB.",
)
def p01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    deduped = exact_dedup(docs, ["text"], "doc_id")
    scored = deduped.select(
        "lang",
        T.token_count("text").alias("n_tokens"),
        T.stopword_ratio("text").alias("sw_ratio"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when((F.col("n_tokens") >= 20) & (F.col("sw_ratio") >= 0.02), 1).otherwise(0)
        ).alias("n_clean"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "s05_hash_sample",
    f"""
    WITH b AS (
      SELECT lang,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) % 10000 AS bucket
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE bucket < 2000) AS n_sampled,
           COUNT(*) FILTER (WHERE bucket >= 1000) AS n_train,
           COUNT(*) FILTER (WHERE bucket < 1000) AS n_heldout
    FROM b
    GROUP BY lang
    """,
    doc="Deterministic hash-bucket sampling: 20% sample + disjoint "
    "90/10 train/heldout split, reproducible across engines, "
    "partitionings and retries (operators/sampling.py).",
)
def s05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = docs.select("lang", hash_bucket(F.col("doc_id")).alias("bucket"))
    return b.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("bucket") < 2000, 1).otherwise(0)).alias("n_sampled"),
        F.sum(F.when(F.col("bucket") >= 1000, 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("bucket") < 1000, 1).otherwise(0)).alias("n_heldout"),
    )


@register(
    "t06_pandas_udf_readability",
    """
    SELECT lang,
           ROUND(AVG(206.835 - 1.015 * n_words / GREATEST(n_sent, 1)
                     - 84.6 * n_chars_w / GREATEST(n_words, 1) / 4.7), 4)
             AS avg_readability
    FROM (
      SELECT lang,
             len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))
               AS n_words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_chars_w
      FROM documents
    ) d
    GROUP BY lang
    """,
    doc="Arrow-vectorized scalar pandas_udf (Flesch-style readability) "
    "— demonstrates the @pandas_udf surface; per-row arithmetic is "
    "IEEE-deterministic so it stays oracle-able.",
)
def t06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def readability(text: pd.Series) -> pd.Series:
        words = text.str.split().str.len().astype("float64")
        sents = (
            text.str.findall(r"[.!?]+").str.len().clip(lower=1).astype("float64")
        )
        chars = text.str.replace(r"[^A-Za-z]", "", regex=True).str.len().astype("float64")
        return 206.835 - 1.015 * words / sents - 84.6 * chars / words.clip(lower=1) / 4.7

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", readability("text").alias("r"))
        .groupBy("lang")
        .agg(F.round(F.avg("r"), 4).alias("avg_readability"))
    )


@register(
    "t07_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS.format(col='lower(text)')}) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
      FROM tf JOIN idf USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    ORDER BY doc_id, rk
    """,
    doc="TF-IDF top-3 terms per document. Determinism: rank on the "
    "ROUNDed score with a term tiebreak — LN() may differ by an ulp "
    "between engines, ROUND(.,4) absorbs it. Scale: the idf table is "
    "vocabulary-sized (broadcastable); tf is one explode + one "
    "shuffle with map-side combine.",
)
def t07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens("lower(text)")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


@register(
    "c01_token_chunks",
    f"""
    WITH d AS (
      SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 64 THEN 0
                  ELSE (len(toks) - 64 + 48 - 1) // 48 END AS k
      FROM d
    ),
    chunks AS (
      SELECT doc_id, unnest(generate_series(0, k)) AS chunk_idx, toks
      FROM s
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')
             AS chunk_text,
           CAST(len(list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64)) AS INT)
             AS n_tokens
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
    doc="Document chunking into overlapping token windows (width 64, "
    "stride 48) — the LLM-pretraining chunker. Map-only generator "
    "expression (functions/text.chunk_expr): no shuffle at any scale.",
)
def c01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.chunk_expr("text", width=64, stride=48)
    ).orderBy("doc_id", "chunk_idx")


@register(
    "c02_sequence_packing",
    f"""
    WITH d AS (
      SELECT doc_id,
             doc_id % 8 AS shard,
             len({_SQL_TOKS.format(col='text')}) AS n_toks
      FROM documents
    ),
    r AS (
      SELECT shard, doc_id, n_toks,
             SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS end_pos
      FROM d
    ),
    b AS (
      SELECT shard, n_toks, end_pos,
             CAST(FLOOR((end_pos - 1) / 512.0) AS BIGINT) AS bin,
             FLOOR((end_pos - n_toks) / 512.0) <> FLOOR((end_pos - 1) / 512.0)
               AS straddles
      FROM r
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(FLOOR((MAX(end_pos) - 1) / 512.0) + 1 AS BIGINT) AS n_bins,
           CAST(SUM(CASE WHEN straddles THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddlers,
           ROUND(CAST(SUM(n_toks) AS DOUBLE) / (
             (FLOOR((MAX(end_pos) - 1) / 512.0) + 1) * 512), 4) AS utilization
    FROM b
    GROUP BY shard
    """,
    doc="Sequence packing (concat-and-chunk): documents are sharded "
    "into 8 independent streams, concatenated in doc_id order, and "
    "cut into 512-token context windows; per-shard window counts, "
    "boundary straddlers, and utilization. One shuffle (the window "
    "partition); shards scale out the per-stream sequential packing "
    "(operators/packing.py).",
)
def c02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.packing import packing_stats

    docs = load_table(spark, sf_dir, "documents")
    return packing_stats(docs, budget=512, shards=8)


@register(
    "s06_stratified_sample",
    """
    WITH b AS (
      SELECT lang,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) % 10000 AS bucket
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE (lang <> 'en' OR bucket < 2000)
                              AND (lang <> 'es' OR bucket < 5000)) AS n_kept
    FROM b
    GROUP BY lang
    """,
    doc="Stratified deterministic downsampling: keep 20% of 'en', 50% "
    "of 'es', all other strata whole "
    "(operators/sampling.stratified_hash_sample) — reproducible "
    "language rebalancing for training corpora.",
)
def s06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.2, "es": 0.5})
    tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    k = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return tot.join(k, "lang", "left").select(
        "lang", "n_total", F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept")
    )


@register(
    "t08_unigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, source, t.tok
      FROM documents,
           UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS t(tok)
    ),
    cnts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n_total FROM toks)
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(1) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(ROUND(LN(cnt) * 1000000) AS BIGINT))
                - COUNT(*) * (SELECT CAST(ROUND(LN(n_total) * 1000000) AS BIGINT)
                              FROM tot) AS DOUBLE)
             / COUNT(*) / 1000000.0 AS avg_logprob
    FROM toks JOIN cnts USING (tok)
    GROUP BY source
    """,
    doc="Corpus unigram language-model score: token-weighted mean "
    "log-probability under the corpus unigram distribution, per "
    "source — the classic cheap LM-quality signal. Log values are "
    "quantized to integer micro-units before summing so the "
    "aggregation is order-insensitive and cross-engine exact; the "
    "only double ops are one cast and two divisions at the very end.",
)
def t08(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.expr(T.tokens_sql("text"))).alias("tok")
    )
    cnts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        # vocab size is unbounded at scale: let AQE pick broadcast vs
        # shuffle for the count side (it broadcasts at bench SFs)
        toks.join(cnts, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.lit(1)).alias("n_tokens"),
            # decimal(38,0) accumulators: the micro-unit log sum and
            # the count*log(n_total) cross term both scale with corpus
            # token count x ~2e7 and clear int64 at 100x counts
            # (lint_overflow's class). Integer-exact difference either
            # way; the cast to DOUBLE sees the same integer.
            F.expr(
                "CAST(SUM(CAST(CAST(ROUND(LN(cnt) * 1000000) AS BIGINT)"
                "          AS DECIMAL(38,0)))"
                " - CAST(COUNT(*) AS DECIMAL(38,0))"
                "   * ANY_VALUE(CAST(ROUND(LN(n_total) * 1000000) AS BIGINT))"
                " AS DOUBLE) / COUNT(*) / 1000000.0"
            ).alias("avg_logprob"),
        )
    )


@register(
    "t09_repetition_filter",
    """
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t
      FROM documents
    ),
    bi AS (
      SELECT doc_id, source, len(t) AS n_tok,
             CASE WHEN len(t) >= 2 THEN
               CAST(ROUND((1 - CAST(len(list_distinct(
                 list_transform(generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i + 1]))) AS DOUBLE)
                 / (len(t) - 1)) * 1000000) AS BIGINT)
             ELSE 0 END AS dup2_u
      FROM toks
    ),
    top AS (
      SELECT doc_id,
             CAST(ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) * 1000000) AS BIGINT)
               AS top_u
      FROM (
        SELECT doc_id, tok, COUNT(*) AS cnt
        FROM toks, UNNEST(t) AS u(tok)
        GROUP BY doc_id, tok
      ) c
      GROUP BY doc_id
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE dup2_u > 100000 OR top_u > 200000) AS n_flagged,
           CAST(SUM(dup2_u) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_dup_bigram,
           CAST(SUM(top_u) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_top_token
    FROM bi JOIN top USING (doc_id)
    GROUP BY source
    """,
    doc="Gopher-style repetition quality filter: per-doc duplicate "
    "bigram fraction (map-only array expression) and most-common-"
    "token mass (one explode+agg), flagged against the classic "
    ">10% dup-bigram / >20% top-token thresholds, rolled up per "
    "source. Ratios quantized to integer micro-units before "
    "averaging so both engines agree exactly.",
)
def t09(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.expr(T.tokens_sql("text")).alias("t")
    )
    bi = toks.select(
        "doc_id",
        "source",
        F.expr(
            "CASE WHEN size(t) >= 2 THEN "
            "CAST(ROUND((1 - CAST(size(array_distinct("
            "transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))) AS DOUBLE)"
            " / (size(t) - 1)) * 1000000) AS BIGINT) ELSE 0 END"
        ).alias("dup2_u"),
    )
    top = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) * 1000000) AS BIGINT)"
            ).alias("top_u")
        )
    )
    return (
        bi.join(top, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when((F.col("dup2_u") > 100000) | (F.col("top_u") > 200000), 1).otherwise(0)
            ).alias("n_flagged"),
            F.expr("CAST(SUM(dup2_u) AS DOUBLE) / COUNT(*) / 1000000.0").alias(
                "avg_dup_bigram"
            ),
            F.expr("CAST(SUM(top_u) AS DOUBLE) / COUNT(*) / 1000000.0").alias(
                "avg_top_token"
            ),
        )
    )


@register(
    "t10_token_entropy",
    """
    WITH c AS (
      SELECT doc_id, lang, tok, COUNT(*) AS cnt
      FROM (
        SELECT doc_id, lang, t.tok
        FROM documents,
             UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS t(tok)
      ) x
      GROUP BY doc_id, lang, tok
    ),
    t AS (
      SELECT doc_id, lang, cnt,
             SUM(cnt) OVER (PARTITION BY doc_id) AS n
      FROM c
    ),
    d AS (
      SELECT doc_id, lang,
             SUM(cnt) AS n_tok,
             SUM(CAST(ROUND((CAST(cnt AS DOUBLE) / n)
                            * LN(CAST(cnt AS DOUBLE) / n)
                            * 1000000000) AS BIGINT)) AS neg_h_u
      FROM t
      GROUP BY doc_id, lang
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(-neg_h_u) AS DOUBLE) / SUM(n_tok) / 1000000000.0
             AS entropy_per_token,
           COUNT(*) FILTER (WHERE CAST(-neg_h_u AS DOUBLE) / n_tok / 1000000000.0 < 2.0)
             AS n_low_entropy
    FROM d
    GROUP BY lang
    """,
    doc="Per-document token-distribution entropy (nats), rolled up per "
    "language with a low-entropy (repetitive/templated) flag — the "
    "third classic cheap quality signal next to t08/t09. Per-term "
    "p*ln(p) values are identical doubles in both engines (exact "
    "integer ratios through LN), quantized to nano-units before "
    "summing so aggregation order cannot matter.",
)
def t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id")
    c = (
        docs.select(
            "doc_id", "lang", F.explode(F.expr(T.tokens_sql("text"))).alias("tok")
        )
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("__n", F.sum("cnt").over(w))
        .withColumn(
            "term_u",
            F.expr(
                "CAST(ROUND((CAST(cnt AS DOUBLE) / __n) * LN(CAST(cnt AS DOUBLE) / __n)"
                " * 1000000000) AS BIGINT)"
            ),
        )
    )
    d = c.groupBy("doc_id", "lang").agg(
        F.sum("cnt").alias("n_tok"), F.sum("term_u").alias("neg_h_u")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(-neg_h_u) AS DOUBLE) / SUM(n_tok) / 1000000000.0").alias(
            "entropy_per_token"
        ),
        F.expr(
            "COUNT(*) FILTER (WHERE CAST(-neg_h_u AS DOUBLE) / n_tok / 1000000000.0 < 2.0)"
        ).alias("n_low_entropy"),
    )


@register(
    "d07_containment_pairs",
    f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS sh
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents))
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs)
    SELECT doc_a, doc_b,
           ROUND(CAST(inter AS DOUBLE) / LEAST(sa.n, sb.n), 6) AS containment
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(inter AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.9
    """,
    doc="Containment-coefficient near-dups (|A∩B| / min(|A|,|B|) >= "
    "0.9): catches a short document embedded inside a longer one, "
    "which Jaccard (d02) misses because the union is dominated by "
    "the longer side. Same inverted-index join, different normalizer, "
    "same DEFAULT_MAX_POSTING cap on posting lists (no-op at test SF).",
)
def d07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import cap_postings

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.shingle_hashes("text").alias("sh")
    )
    # Sizes ride the posting explode and come back out of the pair
    # aggregate (the d02 rewrite — both size joins gone; the shingle
    # relation now has a single consumer, so no checkpoint either).
    ex = cap_postings(
        docs.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")),
        ["s"],
    )
    ex2 = ex.select(
        F.col("doc_id").alias("doc_b_id"), F.col("n").alias("n2"), F.col("s").alias("s2")
    )
    pairs = (
        ex.join(ex2, (ex.s == ex2.s2) & (ex.doc_id < ex2.doc_b_id))
        .groupBy(F.col("doc_id").alias("doc_a"), F.col("doc_b_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("n").alias("na"),
            F.max("n2").alias("nb"),
        )
    )
    cont = F.col("inter").cast("double") / F.least(F.col("na"), F.col("nb"))
    return (
        pairs.where(cont >= 0.9)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )


def _gram13_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d08's shared index: distinct (doc_id, split, g) 13-gram rows
    under the overflow-guarded hash split. Also consumed by d17's
    dropped-mass audit so the audit replays the finder's exact keys."""
    doc = load_table(spark, sf_dir, "documents")
    toks = T.tokens_sql("text")
    base = doc.select(
        "doc_id",
        F.expr(
            "CASE WHEN ((doc_id % 2147483648) * 2654435761) % 2147483648 % 10 = 0 "
            "THEN 'eval' ELSE 'train' END"
        ).alias("split"),
        F.expr(toks).alias("t"),
    ).where(F.expr("size(t) >= 13"))
    return base.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 12), "
                "i -> concat_ws(' ', slice(t, i, 13)))"
            )
        ).alias("g"),
    ).distinct()


@register(
    "d08_contamination",
    """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN ((doc_id % 2147483648) * 2654435761) % 2147483648 % 10 = 0
                  THEN 'eval' ELSE 'train' END AS split,
             list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, split,
             UNNEST(list_transform(generate_series(1, len(t) - 12),
                    i -> array_to_string(t[i:i+12], ' '))) AS g
      FROM toks WHERE len(t) >= 13
    ),
    ev AS (SELECT DISTINCT doc_id, g FROM grams WHERE split = 'eval'),
    tr AS (SELECT DISTINCT doc_id, g FROM grams WHERE split = 'train')
    SELECT ev.doc_id AS eval_doc,
           CAST(COUNT(DISTINCT ev.g) AS BIGINT) AS shared_13grams,
           CAST(COUNT(DISTINCT tr.doc_id) AS BIGINT) AS train_docs
    FROM ev JOIN tr ON ev.g = tr.g
    GROUP BY ev.doc_id
    """,
    doc="Train/eval contamination check (the decontamination pass "
    "every LLM data pipeline runs before training): deterministic "
    "hash split (10% eval), then eval docs sharing any 13-gram with "
    "a train doc, with overlap counts. The join key here is the "
    "13-gram STRING so the DuckDB oracle replays it exactly; at "
    "100 TB the same plan joins on xxhash64(gram) — 8-byte shuffle "
    "keys, identical shape (cf. the d02 inverted shingle index). "
    "Both sides dedup grams per doc BEFORE the join (the inverted "
    "index explodes once per distinct gram, not per occurrence). "
    "Each side's gram posting list is capped at DEFAULT_MAX_POSTING "
    "(a gram in every doc would join |eval|×|train| rows under one "
    "key); the cap never triggers at test SF. The split hash "
    "reduces doc_id mod 2^31 BEFORE the Knuth multiply (identity "
    "for ids < 2^31, so gate-SF results are bit-identical) so the "
    "product stays under 2^62 and cannot overflow int64 under ANSI "
    "even for snowflake-scale 64-bit ids — same guard as the "
    "v06/v10/v11 seed hash (operators/ivf.py:50).",
)
def d08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import cap_postings

    grams = _gram13_split(spark, sf_dir)
    ev = cap_postings(
        grams.where(F.col("split") == "eval").select(
            F.col("doc_id").alias("eval_doc"), "g"
        ),
        ["g"],
    )
    tr = cap_postings(
        grams.where(F.col("split") == "train").select(
            F.col("doc_id").alias("train_doc"), "g"
        ),
        ["g"],
    )
    return (
        ev.join(tr, "g")
        .groupBy("eval_doc")
        .agg(
            F.countDistinct("g").alias("shared_13grams"),
            F.countDistinct("train_doc").alias("train_docs"),
        )
    )


@register(
    "d17_dropped_posting_mass",
    f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS sh
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents))
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    scounts AS (SELECT s, COUNT(*) AS b FROM ex GROUP BY s),
    scaps AS (SELECT CAST(unnest([4, 512]) AS BIGINT) AS cap),
    shingle AS (
      SELECT 'shingle' AS index_name, cap,
             CAST(COUNT(*) FILTER (WHERE b > cap) AS BIGINT) AS buckets_over_cap,
             CAST(COALESCE(SUM(b) FILTER (WHERE b > cap), 0) AS BIGINT)
               AS dropped_posting_rows,
             CAST(COALESCE(SUM(b * (b - 1) // 2) FILTER (WHERE b > cap), 0) AS BIGINT)
               AS dropped_pair_mass,
             CAST(SUM(b) AS BIGINT) AS total_posting_rows
      FROM scounts, scaps GROUP BY cap
    ),
    toks AS (
      SELECT doc_id,
             CASE WHEN ((doc_id % 2147483648) * 2654435761) % 2147483648 % 10 = 0
                  THEN 'eval' ELSE 'train' END AS split,
             {_SQL_TOKS.format(col='text')} AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, split,
             UNNEST(list_transform(generate_series(1, len(t) - 12),
                    i -> array_to_string(t[i:i+12], ' '))) AS g
      FROM toks WHERE len(t) >= 13
    ),
    gcounts AS (
      SELECT split, g, COUNT(*) AS b
      FROM (SELECT DISTINCT doc_id, split, g FROM grams) GROUP BY split, g
    ),
    gcaps AS (SELECT CAST(unnest([2, 512]) AS BIGINT) AS cap),
    gram AS (
      SELECT 'gram13_' || split AS index_name, cap,
             CAST(COUNT(*) FILTER (WHERE b > cap) AS BIGINT) AS buckets_over_cap,
             CAST(COALESCE(SUM(b) FILTER (WHERE b > cap), 0) AS BIGINT)
               AS dropped_posting_rows,
             CAST(COALESCE(SUM(b * (b - 1) // 2) FILTER (WHERE b > cap), 0) AS BIGINT)
               AS dropped_pair_mass,
             CAST(SUM(b) AS BIGINT) AS total_posting_rows
      FROM gcounts, gcaps GROUP BY split, cap
    )
    SELECT * FROM shingle
    UNION ALL
    SELECT * FROM gram
    """,
    doc="Gated dropped-posting-mass report (the audit the capped "
    "finders d02/d07/d08/d10 point at, promoted from helper to "
    "first-class output): for each posting index the capped dedup "
    "family joins on — the shingle-hash index and d08's per-split "
    "13-gram index, replayed with EXACTLY the finders' key "
    "construction — report per cap how many posting lists the cap "
    "drops, the posting rows they carry, and the b*(b-1)/2 candidate "
    "pair mass lost. Two caps per index: the production "
    "DEFAULT_MAX_POSTING=512 (zero at test SF; at the dup-heavy sf5 "
    "probe corpus this row is where d02's measured recall collapse — "
    "6.56M of 13.26M posting rows dropped — becomes VISIBLE pipeline "
    "output) and a low audit threshold (4 / 2) that triggers at test "
    "SF so the oracle verifies non-degenerate mass arithmetic. "
    "Shape at 100 TB: the same vocabulary-keyed shuffle the finders "
    "already pay, then an O(#caps)-row aggregate — the report is 6 "
    "rows at any corpus size (cf. the p03 dataset-card idiom).",
)
def d17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import dropped_posting_mass

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.shingle_hashes("text").alias("sh")
    )
    ex = docs.select("doc_id", F.explode("sh").alias("s"))
    shingle = dropped_posting_mass(ex, ["s"], [4, 512], "shingle")

    grams = _gram13_split(spark, sf_dir)
    ev = grams.where(F.col("split") == "eval").select("doc_id", "g")
    tr = grams.where(F.col("split") == "train").select("doc_id", "g")
    gram_ev = dropped_posting_mass(ev, ["g"], [2, 512], "gram13_eval")
    gram_tr = dropped_posting_mass(tr, ["g"], [2, 512], "gram13_train")
    return shingle.unionAll(gram_ev).unionAll(gram_tr)


@register(
    "t11_pii_scrub",
    """
    WITH seeded AS (
      -- synthesized PII column: the driver corpus is word salad, so
      -- the PII is injected deterministically (same rule both
      -- engines) and then DETECTED + REDACTED by the operator under
      -- test -- the regex pipeline is what's being verified.
      SELECT doc_id, source,
             text || CASE
               WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               WHEN doc_id % 3 = 1
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || ' or 555-123-4567'
               ELSE ''
             END AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, source, text,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text,
                 '\\+?1?[- ]?\\(?555\\)?[- ]?[0-9]{3,4}([- ][0-9]{4})?')) AS n_phones,
             regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\+?1?[- ]?\\(?555\\)?[- ]?[0-9]{3,4}([- ][0-9]{4})?', '<PHONE>', 'g')
               AS clean
      FROM seeded
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(SUM(CASE WHEN n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
           CAST(SUM(n_emails + n_phones) AS BIGINT) AS total_redactions,
           CAST(SUM(len(text) - len(clean)) AS BIGINT) AS chars_removed
    FROM scrubbed
    GROUP BY source
    """,
    doc="PII detection + redaction audit per source (email/phone "
    "regexes -> <EMAIL>/<PHONE> placeholders), counting detected "
    "spans and characters removed. The corpus is synthetic word "
    "salad, so PII is INJECTED deterministically first (same rule "
    "in both engines) and the detection/redaction pipeline is "
    "what's verified. Map-only regexp expressions + one aggregate "
    "shuffle: the exact shape of a 100 TB scrubbing pass.",
)
def t11(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}"
    phone_re = "\\\\+?1?[- ]?\\\\(?555\\\\)?[- ]?[0-9]{3,4}([- ][0-9]{4})?"
    seeded = doc.select(
        "doc_id",
        "source",
        F.expr(
            "text || CASE "
            "WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS STRING) "
            "|| '@example.com now' "
            "WHEN doc_id % 3 = 1 THEN ' call +1-555-' "
            "|| lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' or 555-123-4567' "
            "ELSE '' END"
        ).alias("text"),
    )
    scrubbed = seeded.select(
        "source",
        "text",
        F.expr(f"size(regexp_extract_all(text, '{email_re}', 0))").alias("n_emails"),
        F.expr(f"size(regexp_extract_all(text, '{phone_re}', 0))").alias("n_phones"),
        F.expr(
            f"regexp_replace(regexp_replace(text, '{email_re}', '<EMAIL>'), "
            f"'{phone_re}', '<PHONE>')"
        ).alias("clean"),
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("n_emails") > 0, 1).otherwise(0)).alias("docs_with_email"),
        F.sum(F.when(F.col("n_phones") > 0, 1).otherwise(0)).alias("docs_with_phone"),
        F.sum(F.col("n_emails") + F.col("n_phones")).alias("total_redactions"),
        (F.sum(F.length("text") - F.length("clean"))).alias("chars_removed"),
    )


@register(
    "d10_duplicate_shingle_fraction",
    f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS sh
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents))
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    freq AS (SELECT s, COUNT(*) AS nd FROM ex GROUP BY s),
    per AS (
      SELECT e.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM ex e JOIN freq f ON e.s = f.s
      GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_dup,
           ROUND(CAST(n_dup AS DOUBLE) / n_shingles, 6) AS dup_fraction
    FROM per
    WHERE n_dup > 0
    """,
    doc="Per-document corpus redundancy score: the fraction of a "
    "document's distinct shingles that appear in at least one OTHER "
    "document (shingles are per-doc distinct, so a global posting "
    "count > 1 means cross-document sharing). The quality-filter "
    "complement of the d02/d04 pair finders: a ranking signal for "
    "boilerplate-heavy documents rather than a pair list. Shape: "
    "inverted shingle index, two hash aggregations + one join on "
    "8-byte keys, no pairwise expansion anywhere — at 100 TB this is "
    "the same one-pass posting-count plan. Degenerate shingles are "
    "dropped by the DEFAULT_MAX_POSTING cap (the ex⋈freq join is "
    "linear, but a hot key still lands its whole posting list on one "
    "reducer); no-op at test SF.",
)
def d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import cap_postings

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", T.shingle_hashes("text").alias("sh")
    )
    # The cap window's own per-posting count IS the frequency for
    # every surviving row (the cap drops whole buckets), so the freq
    # aggregate + join are gone — one window pass feeds the per-doc
    # rollup directly (r13-opt).
    ex = cap_postings(
        docs.select("doc_id", F.explode("sh").alias("s")), ["s"], keep_size="nd"
    )
    per = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_dup"),
    )
    return per.filter(F.col("n_dup") > 0).select(
        "doc_id",
        "n_shingles",
        "n_dup",
        F.round(F.col("n_dup").cast("double") / F.col("n_shingles"), 6).alias(
            "dup_fraction"
        ),
    )


@register(
    "s09_temperature_sampling",
    f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    floor_n AS (SELECT MIN(n) AS n_min FROM counts),
    rates AS (
      SELECT source, n,
             SQRT(CAST(n_min AS DOUBLE) / n) AS keep_rate
      FROM counts, floor_n
    ),
    b AS (
      SELECT source,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) % 10000 AS bucket
      FROM documents
    )
    SELECT r.source,
           r.n AS n_docs,
           ROUND(r.keep_rate, 6) AS keep_rate,
           COUNT(*) FILTER (
             WHERE b.bucket < CAST(FLOOR(r.keep_rate * 10000) AS BIGINT)
           ) AS n_kept
    FROM b JOIN rates r ON b.source = r.source
    GROUP BY r.source, r.n, r.keep_rate
    """,
    doc="Temperature-scaled source sampling (tau=2, i.e. p proportional "
    "to n^0.5): each source's keep rate is sqrt(n_min/n), so the "
    "smallest source is kept whole and over-represented sources are "
    "downsampled toward balance — the standard multilingual/multi-"
    "corpus rebalancing move. Rates use only per-source unary IEEE "
    "ops on exact integers (no cross-row float summation), so both "
    "engines compute bit-identical thresholds; membership is the "
    "portable hash bucket, reproducible across engines and retries.",
)
def s09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    floor_n = counts.agg(F.min("n").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(floor_n)).select(
        "source",
        "n",
        F.sqrt(F.col("n_min").cast("double") / F.col("n")).alias("keep_rate"),
    )
    b = docs.select("source", hash_bucket(F.col("doc_id")).alias("bucket"))
    return (
        b.join(F.broadcast(rates), "source")
        .groupBy("source", "n", "keep_rate")
        .agg(
            F.sum(
                F.when(
                    F.col("bucket")
                    < F.floor(F.col("keep_rate") * 10000).cast("long"),
                    1,
                ).otherwise(0)
            ).alias("n_kept")
        )
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round("keep_rate", 6).alias("keep_rate"),
            "n_kept",
        )
    )


@register(
    "s10_importance_resampling",
    f"""
    WITH d AS (
      SELECT source, doc_id,
             len({_SQL_TOKS.format(col='text')}) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT source, n_tokens,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) % 10000 AS bucket,
             CAST(FLOOR(LEAST(n_tokens, 200) / 200.0 * 10000) AS BIGINT)
               AS keep_below
      FROM d
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE bucket < keep_below) AS n_kept,
           CAST(SUM(CASE WHEN bucket < keep_below THEN n_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens
    FROM b
    GROUP BY source
    """,
    doc="Importance resampling by per-document weight: keep "
    "probability proportional to token count (capped at 200 -> "
    "weight 1.0), membership decided by the portable hash bucket "
    "against a per-doc threshold. The threshold arithmetic is one "
    "int->double division and multiply per row (IEEE-identical in "
    "both engines; no cross-row float accumulation), so the sample "
    "is bit-reproducible across engines, partitionings and retries. "
    "Map-only + one aggregation.",
)
def s10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        T.token_count("text").alias("n_tokens"),
        hash_bucket(F.col("doc_id")).alias("bucket"),
    ).withColumn(
        "keep_below",
        F.floor(F.least(F.col("n_tokens"), F.lit(200)) / 200.0 * 10000).cast(
            "long"
        ),
    )
    kept = F.col("bucket") < F.col("keep_below")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
    )


@register(
    "p02_pretraining_mixture_pipeline",
    f"""
    WITH keep AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
    ),
    d AS (
      SELECT doc.source, doc.doc_id,
             len({_SQL_TOKS.format(col='doc.text')}) AS n_tokens
      FROM documents doc JOIN keep ON doc.doc_id = keep.doc_id
    ),
    counts AS (SELECT source, COUNT(*) AS n FROM d GROUP BY source),
    fl AS (SELECT MIN(n) AS n_min FROM counts),
    rates AS (
      SELECT source, CAST(FLOOR(SQRT(CAST(n_min AS DOUBLE) / n) * 10000)
                          AS BIGINT) AS keep_below
      FROM counts, fl
    ),
    b AS (
      SELECT d.source, d.n_tokens,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(d.doc_id AS VARCHAR), ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) % 10000 AS bucket,
             r.keep_below
      FROM d JOIN rates r ON d.source = r.source
    )
    SELECT source,
           COUNT(*) FILTER (WHERE bucket < keep_below) AS n_docs_kept,
           CAST(SUM(CASE WHEN bucket < keep_below THEN n_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           CAST(FLOOR(SUM(CASE WHEN bucket < keep_below THEN n_tokens ELSE 0 END)
                      / 512) AS BIGINT) AS full_sequences_512
    FROM b
    GROUP BY source
    """,
    doc="Composed pretraining-mixture pipeline: exact dedup (keep min "
    "doc id per text) -> temperature-scaled source rebalancing "
    "(tau=2, portable hash membership) -> packing yield (how many "
    "full 512-token training sequences each source contributes). One "
    "declarative plan — dedup agg, tiny broadcast rates, final agg — "
    "the end-to-end recipe a 100 TB data pipeline runs nightly.",
)
def p02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import exact_dedup
    from ice_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    d = exact_dedup(docs, ["text"], "doc_id").select(
        "source",
        T.token_count("text").alias("n_tokens"),
        hash_bucket(F.col("doc_id")).alias("bucket"),
    )
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    fl = counts.agg(F.min("n").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(fl)).select(
        "source",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n")) * 10000
        )
        .cast("long")
        .alias("keep_below"),
    )
    b = d.join(F.broadcast(rates), "source")
    kept = F.col("bucket") < F.col("keep_below")
    kept_tokens = F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
    return b.groupBy("source").agg(
        F.count(F.when(kept, 1)).alias("n_docs_kept"),
        kept_tokens.cast("long").alias("kept_tokens"),
        F.floor(kept_tokens / 512).cast("long").alias("full_sequences_512"),
    )


@register(
    "t12_bpe_merge_pairs",
    f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS.format(col='lower(text)')}) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                    i -> substr(tok, CAST(i AS INTEGER), 2))) AS pair,
             freq
      FROM vocab WHERE length(tok) >= 2
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
    doc="First BPE training step: the 20 most frequent adjacent "
    "character pairs across the corpus, token-frequency weighted — "
    "the merge candidates a tokenizer trainer would pick from. The "
    "pair explosion runs on the aggregated VOCABULARY (one row per "
    "distinct token), not on the corpus: at 100 TB the corpus scan "
    "contributes only a token-frequency groupBy (map-side combinable, "
    "vocab-sized shuffle), and the O(token_length) pair expansion "
    "touches each distinct token once.",
)
def t12(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .where(F.length("tok") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(20)
    )


def _d11_oracle() -> str:
    # same 16-permutation / 8-band spec as d04, but batch-vs-corpus:
    # the incoming 10% (doc_id % 10 = 0) is admitted unless it
    # LSH-collides with, and Jaccard-verifies against, the existing 90%.
    sig = ", ".join(
        f"list_min(list_transform(shs, h -> (h * {2 * j + 3} + {7 * j + 1}) "
        f"% 1000000007))"
        for j in range(16)
    )
    shingled = f"""
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS shs
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks
                  FROM documents WHERE doc_id % 10 {{op}} 0))
    """
    return f"""
    WITH corpus AS ({shingled.format(op='<>')}),
    batch AS ({shingled.format(op='=')}),
    csig AS (SELECT doc_id, shs, [{sig}] AS mh FROM corpus),
    bsig AS (SELECT doc_id, shs, [{sig}] AS mh FROM batch),
    cbk AS (
      SELECT doc_id, b,
             CAST(mh[2 * b + 1] AS VARCHAR) || '_' ||
             CAST(mh[2 * b + 2] AS VARCHAR) AS key
      FROM csig, generate_series(0, 7) t(b)
    ),
    bbk AS (
      SELECT doc_id, b,
             CAST(mh[2 * b + 1] AS VARCHAR) || '_' ||
             CAST(mh[2 * b + 2] AS VARCHAR) AS key
      FROM bsig, generate_series(0, 7) t(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id, y.doc_id AS cid
      FROM bbk x JOIN cbk y ON x.b = y.b AND x.key = y.key
    ),
    ver AS (
      SELECT id, cid,
             CAST(len(list_intersect(db.shs, dc.shs)) AS DOUBLE) /
             (len(db.shs) + len(dc.shs) - len(list_intersect(db.shs, dc.shs)))
               AS j
      FROM cand
      JOIN batch db ON db.doc_id = cand.id
      JOIN corpus dc ON dc.doc_id = cand.cid
    ),
    per AS (
      SELECT id, CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_candidates,
             ROUND(MAX(j), 6) AS best_jaccard
      FROM ver GROUP BY id
    )
    SELECT b.doc_id,
           COALESCE(per.n_candidates, 0) AS n_candidates,
           per.best_jaccard,
           CAST(CASE WHEN per.best_jaccard IS NULL
                       OR per.best_jaccard < 0.8 THEN 1 ELSE 0 END AS BIGINT)
             AS admitted
    FROM batch b LEFT JOIN per ON b.doc_id = per.id
    """


@register(
    "d11_incremental_neardup_admission",
    _d11_oracle(),
    doc="Streaming-ingest dedup gate: each document of an incoming "
    "batch (doc_id % 10 = 0, ~10%) is admitted unless it is a "
    "near-duplicate (LSH collision + Jaccard >= 0.8) of the existing "
    "corpus (the other 90%). The batch-vs-corpus join touches only "
    "colliding band keys — shuffle scales with the BATCH, never "
    "corpus x corpus; in production the corpus band keys are "
    "precomputed at ingest and stored (KBs/million docs/band). The "
    "reference's insert dedup (--skip) is this gate with exact file "
    "hashes; near-dup text admission is its 100 TB generalization.",
)
def d11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import incremental_lsh_admission

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    out = incremental_lsh_admission(
        corpus, batch, id_col="doc_id", text_col="text", n_hashes=16, bands=8,
        threshold=0.8,
    )
    return out.select(
        "doc_id",
        "n_candidates",
        "best_jaccard",
        F.col("admitted").cast("long").alias("admitted"),
    )


@register(
    "d12_fuzzy_name_matches",
    """
    WITH p AS (
      SELECT p_partkey, p_brand, p_size, p_name FROM part
    )
    SELECT a.p_brand,
           a.p_partkey AS part_a, b.p_partkey AS part_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand
     AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 20
    ORDER BY a.p_brand, part_a, part_b
    """,
    doc="Blocked fuzzy entity matching: candidate part pairs form "
    "only WITHIN a (brand, size) block — the classic "
    "entity-resolution blocking that turns O(n^2) edit-distance "
    "comparison into sum of O(block^2); the quadratic work is bounded "
    "by the largest block, never the table. Levenshtein is an "
    "integer metric both engines implement identically, so the "
    "oracle is exact. At 100 TB: shuffle on the block key, and "
    "blocks above DEFAULT_MAX_BUCKET are dropped from comparison "
    "(r8; no-op at test SF — max block 28 at sf0.1) with their mass "
    "reportable: a cap hit means the blocking key is too coarse for "
    "the corpus and needs refining (the standard record-linkage "
    "response), not that the engine should grind through block² "
    "pairs — the 50x probe corpus pushes blocks to 1400 rows and "
    "the uncapped join emitted 424M pairs.",
)
def d12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import cap_postings

    part = load_table(spark, sf_dir, "part")
    p = cap_postings(
        part.select("p_partkey", "p_brand", "p_size", "p_name"),
        ["p_brand", "p_size"],
    )
    a = p.alias("a")
    b = p.alias("b")
    # MERGE-pinned self-join on the block key (the d04/d13 capped
    # self-join pattern): both sides are the same capped relation, so
    # the sort-merge join shares one exchange where the broadcast form
    # rebuilt the cap pipeline as the build side. edit_dist is
    # projected BEFORE the filter so the O(len^2) levenshtein runs
    # once per block pair — in the join-condition form it re-evaluated
    # in the output projection for every surviving pair (most survive:
    # 160k of the sf0.1 pairs pass <= 20). sf1 noop 3-pair medians:
    # 44.3s (base BHJ) / 41.9s (dist-once only) / 27.6s (this form);
    # sf0.1 1.82 -> 1.61s.
    return (
        a.hint("merge")
        .join(
            b.hint("merge"),
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 20)
        .orderBy("p_brand", "part_a", "part_b")
    )


@register(
    "s11_cluster_disjoint_split",
    f"""
    WITH RECURSIVE
    {_SQL_NEARDUP_EDGES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u
    ),
    allc AS (
      SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    sp AS (
      SELECT doc_id, rep,
             CASE WHEN list_reduce(list_prepend(CAST(7 AS BIGINT),
                    list_transform(string_split(CAST(rep AS VARCHAR), ''),
                                   ch -> CAST(ascii(ch) AS BIGINT))),
                    (a, x) -> (a * 131 + x) % 1000000007) % 10000 < 1000
                  THEN 'heldout' ELSE 'train' END AS split
      FROM allc
    ),
    leaky AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_clusters
      FROM (SELECT rep FROM sp GROUP BY rep HAVING COUNT(DISTINCT split) > 1)
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters,
           (SELECT n_leaky_clusters FROM leaky) AS n_leaky_clusters
    FROM sp
    GROUP BY split
    ORDER BY split
    """,
    doc="Leakage-safe train/heldout split: near-dup clusters (connected "
    "components over the J>=0.8 pair graph, large-star/small-star on "
    "the Spark side) are assigned to a split ATOMICALLY by hashing the "
    "cluster representative — a doc and its near-duplicates can never "
    "straddle train and heldout, the contamination mode a plain "
    "per-doc hash split leaves open. Emits per-split doc/cluster "
    "counts plus an in-query audit that zero clusters span splits. "
    "Scale: the split adds one hash + one broadcast-size join over "
    "the component map to the d06 clustering cost; singleton docs "
    "never enter the pair graph at all. REGIME FORK (measured, "
    "PERF.md r8): this inverted-index pair source is the right tool "
    "for boilerplate-light corpora; on duplication-heavy corpora "
    "whose dup groups approach DEFAULT_MAX_POSTING, the posting cap "
    "zeroes its recall (sf5: 356.8s on a capped-out index) — use "
    "s13_cluster_split_lsh, the same split tail "
    "(operators.sampling.cluster_safe_split) over d04's banded "
    "pairs (sf5: 60.5s, full recall).",
)
def s11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.sampling import cluster_safe_split
    from ice_spark.queries.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    pairs = QUERIES["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    return cluster_safe_split(docs, pairs)


def _s13_oracle() -> str:
    # Reuse d04's exact banded-MinHash pair spec as the edge source:
    # take its oracle up to (and including) the `ver` CTE, then run
    # the s11 split tail over those pairs. String surgery rather than
    # a shared helper so d04's FROZEN oracle string stays
    # byte-identical.
    d04 = _d04_oracle()
    ctes = d04[: d04.rindex("SELECT doc_a")].rstrip().rstrip(",")
    ctes = ctes.replace("WITH docs AS", "WITH RECURSIVE docs AS", 1)
    return f"""{ctes},
    pairs AS (SELECT doc_a, doc_b FROM ver WHERE j >= 0.8),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u
    ),
    allc AS (
      SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    sp AS (
      SELECT doc_id, rep,
             CASE WHEN list_reduce(list_prepend(CAST(7 AS BIGINT),
                    list_transform(string_split(CAST(rep AS VARCHAR), ''),
                                   ch -> CAST(ascii(ch) AS BIGINT))),
                    (a, x) -> (a * 131 + x) % 1000000007) % 10000 < 1000
                  THEN 'heldout' ELSE 'train' END AS split
      FROM allc
    ),
    leaky AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_clusters
      FROM (SELECT rep FROM sp GROUP BY rep HAVING COUNT(DISTINCT split) > 1)
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters,
           (SELECT n_leaky_clusters FROM leaky) AS n_leaky_clusters
    FROM sp
    GROUP BY split
    ORDER BY split
    """


@register(
    "s13_cluster_split_lsh",
    _s13_oracle(),
    doc="Leakage-safe train/heldout split over the MinHash-LSH pair "
    "graph — s11's split tail composed with d04's banded candidate "
    "generation instead of d02's inverted index. This IS the "
    "100 TB composition for duplication-heavy corpora: the r8 sf5 "
    "probe showed the inverted index's posting cap must choose "
    "between zero recall and quadratic waste when duplicate groups "
    "are cap-sized, while banding's cost is O(candidates) regardless "
    "of posting skew (6.7M pairs in ~19s at sf5). The oracle reuses "
    "d04's exact permutation/banding spec, replays the transitive "
    "closure, and pins the split assignment and the zero-leak audit "
    "bit-for-bit. Shares its split tail with s11 "
    "(operators.sampling.cluster_safe_split); pick the pair source "
    "by corpus regime — s11's measured numbers are at its "
    "docstring.",
)
def s13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import minhash_lsh_pairs
    from ice_spark.operators.sampling import cluster_safe_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, id_col="doc_id", text_col="text", n_hashes=16, bands=8, threshold=0.8
    )
    return cluster_safe_split(docs, pairs)


@register(
    "p03_dataset_card",
    f"""
    WITH base AS (
      SELECT doc_id, source, lang,
             len({_SQL_TOKS.format(col='text')}) AS n_toks,
             {_SQL_CHAR_HASH.format(s='text')} AS fp
      FROM documents
    ),
    fpg AS (
      SELECT fp, MIN(doc_id) AS keeper, COUNT(*) AS n FROM base GROUP BY fp
    ),
    flagged AS (
      SELECT b.source, b.lang, b.n_toks,
             b.doc_id <> g.keeper AS is_dup,
             b.n_toks < 20 AS is_short
      FROM base b JOIN fpg g ON b.fp = g.fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_toks) AS BIGINT) // COUNT(*) AS avg_tokens,
           CAST(COUNT(*) FILTER (WHERE is_dup) AS BIGINT) AS n_exact_dups,
           CAST(COUNT(*) FILTER (WHERE is_short) AS BIGINT) AS n_short_docs,
           CAST(COUNT(*) FILTER (WHERE is_dup) AS BIGINT) * 10000
             // COUNT(*) AS dup_bp,
           CAST(COUNT(*) FILTER (WHERE is_short) AS BIGINT) * 10000
             // COUNT(*) AS short_bp
    FROM flagged
    GROUP BY source
    ORDER BY source
    """,
    doc="Dataset card: the per-source datasheet a corpus release ships "
    "with — doc/language counts, token totals, exact-duplicate rate "
    "and short-doc rate in integer basis points. One scan computes "
    "tokens+fingerprints map-side; the dup flag is a fingerprint "
    "groupBy joined back (key-only shuffle); the report is "
    "O(#sources) rows at any corpus size. Composes the same portable "
    "fingerprint spec as t04/d01, so the card's dup rate is exactly "
    "the rate d01 would deduplicate.",
)
def p03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ice_spark.functions.text import char_hash_arrow, token_count

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        token_count(F.col("text")).alias("n_toks"),
        char_hash_arrow(F.col("text")).alias("fp"),
    )
    # keeper = min(doc_id) within the fingerprint group, as a window
    # over the single fp shuffle instead of a groupBy + join back: the
    # join form re-evaluates `base` (tokenize + char-hash over the full
    # text) on BOTH sides. Partitioned by fp (high-cardinality hash;
    # partition size = exact-dup group size), so no unbounded window.
    w = Window.partitionBy("fp")
    flagged = base.select(
        "source",
        "lang",
        "n_toks",
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
        (F.col("n_toks") < 20).alias("is_short"),
    )
    cnt = F.count(F.lit(1))
    n_dup = F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("long")
    n_short = F.sum(F.when(F.col("is_short"), 1).otherwise(0)).cast("long")
    return (
        flagged.groupBy("source")
        .agg(
            cnt.alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.expr("CAST(sum(n_toks) AS BIGINT) div count(*)").alias("avg_tokens"),
            n_dup.alias("n_exact_dups"),
            n_short.alias("n_short_docs"),
        )
        .withColumn("dup_bp", F.expr("n_exact_dups * 10000 div n_docs"))
        .withColumn("short_bp", F.expr("n_short_docs * 10000 div n_docs"))
        .orderBy("source")
    )


@register(
    "s12_balanced_eval_set",
    f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
                              ch -> CAST(ascii(ch) AS BIGINT))),
               (a, x) -> (a * 131 + x) % 1000000007) AS hv
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
      FROM h
    ),
    pick AS (SELECT * FROM ranked WHERE rn <= 40)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_picked,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM pick
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Balanced evaluation-set construction: exactly 40 docs per "
    "language, selected as the 40 smallest portable-hash values — a "
    "deterministic uniform draw that every engine, partitioning, and "
    "retry reproduces bit-for-bit (the same property s05's split "
    "relies on, here with a fixed per-stratum quota instead of a "
    "rate). The per-lang ROW_NUMBER compiles to Spark's "
    "WindowGroupLimit: each partition forwards at most 40 rows per "
    "language to the shuffle, so the selection cost is bounded by "
    "quota x strata, not corpus size.",
)
def s12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ice_spark.functions.text import char_hash

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", "lang", "n_chars", char_hash(F.col("doc_id").cast("string")).alias("hv")
    )
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    pick = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 40)
    return (
        pick.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_picked"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


def _d13_oracle() -> str:
    sig = ", ".join(
        f"list_min(list_transform(shs, h -> (h * {2 * j + 3} + {7 * j + 1}) "
        f"% 1000000007))"
        for j in range(16)
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS shs
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks
                  FROM documents))
    ),
    sig AS (SELECT doc_id, shs, [{sig}] AS mh FROM docs),
    bk AS (
      SELECT doc_id, b,
             CAST(mh[2 * b + 1] AS VARCHAR) || '_' ||
             CAST(mh[2 * b + 2] AS VARCHAR) AS key
      FROM sig, generate_series(0, 7) t(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bk x JOIN bk y
        ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
    ),
    audit AS (
      SELECT doc_a, doc_b,
             CAST(len(list_filter(generate_series(1, 16),
                                  i -> sa.mh[i] = sb.mh[i])) AS BIGINT)
               AS n_sig_matches,
             CAST(len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS inter,
             CAST(len(sa.shs) + len(sb.shs)
                  - len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS un
      FROM cand
      JOIN sig sa ON sa.doc_id = cand.doc_a
      JOIN sig sb ON sb.doc_id = cand.doc_b
    )
    SELECT doc_a, doc_b, n_sig_matches,
           n_sig_matches * 1000000 // 16 AS est_u,
           inter * 1000000 // un AS exact_u,
           ABS(n_sig_matches * 1000000 // 16 - inter * 1000000 // un) AS err_u
    FROM audit
    ORDER BY doc_a, doc_b
    """


@register(
    "d13_minhash_estimate_audit",
    _d13_oracle(),
    doc="MinHash accuracy audit: for every LSH band-collision candidate "
    "pair (same 16-permutation / 8-band spec as d04, via the shared "
    "band_candidates helper), compare the signature-match estimate of "
    "Jaccard (matches/16) against the exact shingle Jaccard, both in "
    "integer micro-units. This is the measurement that justifies the "
    "sketch: it quantifies, on real candidates, how much the 16-hash "
    "signature's error could mis-rank a dedup decision — the same "
    "audit-the-sketch discipline as k01/k07/v12. Costs one extra "
    "16-term comparison per candidate pair on top of the d04 "
    "pipeline; candidates, not the corpus, bound the work.",
)
def d13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.functions.text import MOD, shingle_hashes
    from ice_spark.operators.dedup import band_candidates

    docs = load_table(spark, sf_dir, "documents")
    # One checkpointed (id, shingles) relation feeds BOTH the
    # signature/banding side and the exact-verify side — before, the
    # shingle hash (the pipeline's most expensive expression) was
    # computed TWICE (once inside minhash_signatures' explode subtree,
    # once for the verify arrays) and the signatures were joined back
    # to the shingles with a corpus-sized merge join. Signatures are
    # map-side array_min(transform(...)) over the materialized array
    # (exactly the minhash_lsh_pairs form — see operators/dedup.py;
    # the size() filter reproduces the explode form's no-row-for-
    # empty-docs semantics), and sa is a single projection of base,
    # so the groupBy exchange AND the sigs-to-shingles join are gone.
    base = docs.select(
        F.col("doc_id").alias("__id"), shingle_hashes("text").alias("shs")
    ).localCheckpoint(eager=False)
    mins = [
        F.expr(
            f"array_min(transform(shs, h -> (h * {2 * j + 3} + {7 * j + 1}) % {MOD}))"
        ).alias(f"mh{j}")
        for j in range(16)
    ]
    sigs = base.where(F.size("shs") > 0).select("__id", *mins)
    cands = band_candidates(sigs, n_hashes=16, bands=8)
    # merge-pinned: sa/sb carry per-doc signature + shingle ARRAYS and
    # grow with the corpus — the static planner broadcast them at the
    # sf10 probe (4 BroadcastHashJoins of a multi-GB deserialized
    # relation, OOM at 8g once the honest evaluator stopped count()
    # from pruning the arrays). Same relation class as d18/g01.
    sa = base.select(
        "__id", F.array(*mins).alias("ma"), F.col("shs").alias("sha")
    )
    sb = sa.select(
        F.col("__id").alias("__id2"), F.col("ma").alias("mb"), F.col("sha").alias("shb")
    )
    j = cands.join(sa.hint("merge"), "__id").join(sb.hint("merge"), "__id2")
    matches = F.size(
        F.filter(
            F.zip_with("ma", "mb", lambda x, y: x == y), lambda m: m
        )
    ).cast("long")
    inter = F.size(F.array_intersect("sha", "shb")).cast("long")
    un = (F.size("sha") + F.size("shb")).cast("long") - inter
    return (
        j.select(
            F.col("__id").alias("doc_a"),
            F.col("__id2").alias("doc_b"),
            matches.alias("n_sig_matches"),
            F.expr("n_sig_matches * 1000000 div 16").alias("est_u"),
            inter.alias("__inter"),
            un.alias("__un"),
        )
        .select(
            "doc_a",
            "doc_b",
            "n_sig_matches",
            "est_u",
            F.expr("__inter * 1000000 div __un").alias("exact_u"),
            F.expr("abs(est_u - __inter * 1000000 div __un)").alias("err_u"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "t13_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS.format(col='text')} AS t FROM documents
    ),
    uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM toks, UNNEST(t) AS u(tok)
      GROUP BY tok
    ),
    n AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total FROM uni),
    bi AS (
      SELECT bg['w1'] AS w1, bg['w2'] AS w2, CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM toks,
           UNNEST(list_transform(generate_series(1, len(t) - 1),
                                 i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS u(bg)
      WHERE len(t) >= 2
      GROUP BY 1, 2
    )
    SELECT w1, w2, n_xy,
           n_xy * (SELECT total FROM n) * 1000000 // (u1.n_tok * u2.n_tok)
             AS assoc_micro
    FROM bi
    JOIN uni u1 ON u1.tok = w1
    JOIN uni u2 ON u2.tok = w2
    WHERE n_xy >= 5
    ORDER BY assoc_micro DESC, w1, w2
    LIMIT 30
    """,
    doc="Collocation extraction: adjacent-token bigrams ranked by the "
    "PMI-monotone association ratio n_xy * N / (n_x * n_y), computed "
    "entirely in integer micro-units (PMI's log is monotone in the "
    "ratio, so ranking needs no float log). The NLP analog of a07's "
    "market-basket lift: bigram explode is map-only, both the bigram "
    "and unigram aggregations are vocabulary-sized keyed shuffles "
    "with map-side partials, marginals join back key-only — no "
    "all-pairs expansion, work bounded by corpus token count.",
)
def t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(tokens(F.col("text")).alias("t")).cache()
    uni = (
        t.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    n = uni.agg(F.sum("n_tok").cast("long").alias("total"))
    bi = (
        t.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("w1"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .where(F.col("n_xy") >= 5)
    )
    u1 = uni.select(F.col("tok").alias("t1"), F.col("n_tok").alias("n_x"))
    u2 = uni.select(F.col("tok").alias("t2"), F.col("n_tok").alias("n_y"))
    return (
        bi.join(u1, F.col("w1") == F.col("t1"))
        .join(u2, F.col("w2") == F.col("t2"))
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "n_xy",
            # decimal(38,0): n_xy*total and n_x*n_y multiply corpus-
            # scaled counts (int64-risky at 100x — lint_overflow's
            # class); integer-exact div either way, DuckDB rides INT128
            F.expr(
                "CAST(n_xy AS DECIMAL(38,0)) * total * 1000000 "
                "div (CAST(n_x AS DECIMAL(38,0)) * n_y)"
            ).alias("assoc_micro"),
        )
        .orderBy(F.desc("assoc_micro"), "w1", "w2")
        .limit(30)
    )


def _c03_oracle() -> str:
    one = """
    SELECT {budget} AS budget, shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(FLOOR((MAX(end_pos) - 1) / {budget}.0) + 1 AS BIGINT) AS n_bins,
           CAST(SUM(CASE WHEN FLOOR((end_pos - n_toks) / {budget}.0)
                              <> FLOOR((end_pos - 1) / {budget}.0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
           ROUND(CAST(SUM(n_toks) AS DOUBLE) / (
             (FLOOR((MAX(end_pos) - 1) / {budget}.0) + 1) * {budget}), 4)
             AS utilization
    FROM (
      SELECT shard, n_toks,
             SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS end_pos
      FROM (SELECT doc_id, doc_id % 8 AS shard,
                   len({toks}) AS n_toks FROM documents)
    )
    GROUP BY shard
    """
    parts = [
        one.format(budget=b, toks=_SQL_TOKS.format(col="text")) for b in (256, 512, 1024)
    ]
    return " UNION ALL ".join(parts) + " ORDER BY budget, shard"


@register(
    "c03_packing_yield_curve",
    _c03_oracle(),
    doc="Context-window packing yield across window sizes 256/512/1024 "
    "(the tokenizer-budget tuning question: how much utilization and "
    "how many boundary-straddling documents each budget costs). "
    "Reuses the c02 packing operator per budget; each branch is the "
    "same single-window-shuffle plan, and the output is "
    "budgets x shards rows. Utilization falls and straddlers rise as "
    "windows shrink — the curve quantifies the trade.",
)
def c03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.packing import packing_stats

    docs = load_table(spark, sf_dir, "documents")
    outs = []
    for b in (256, 512, 1024):
        outs.append(
            packing_stats(docs, budget=b, shards=8).select(
                F.lit(b).cast("int").alias("budget"),
                "shard",
                "n_docs",
                "total_tokens",
                "n_bins",
                "n_straddlers",
                "utilization",
            )
        )
    out = outs[0].unionAll(outs[1]).unionAll(outs[2])
    return out.orderBy("budget", "shard")


@register(
    "d15_cross_source_dup_matrix",
    f"""
    WITH fps AS (
      SELECT doc_id, source,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
               list_transform({_SQL_TOKS.format(col='text')}[1:8],
                              tk -> list_reduce(list_prepend(CAST(7 AS BIGINT),
                                      list_transform(string_split(tk, ''),
                                        c -> CAST(ascii(c) AS BIGINT))),
                                      (a, x) -> (a * 131 + x) % 1000000007))),
               (a, h) -> (a * 1000003 + h) % 1000000007) AS fp
      FROM documents
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
             CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS n_shared_texts
      FROM fps a JOIN fps b
        ON a.fp = b.fp AND a.doc_id < b.doc_id AND a.source <= b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_dup_pairs, n_shared_texts
    FROM pairs
    ORDER BY source_a, source_b
    """,
    doc="Duplicate-provenance matrix: which source pairs share the "
    "same 8-token document OPENING (prefix fingerprint — boilerplate "
    "openings are how template reuse shows up when full texts never "
    "match exactly), counting both colliding pairs and distinct "
    "shared prefixes — the 'where is my corpus copying from itself' "
    "question behind source-level dedup policy. The "
    "join is on the fingerprint key, so only docs whose fingerprint "
    "collides ever meet (duplicate groups, not the corpus, bound the "
    "pair work — the d01/d04 scaling argument); the matrix is "
    "O(|sources|^2) rows.",
)
def d15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.functions.text import char_hash
    from ice_spark.operators.dedup import cap_postings

    docs = load_table(spark, sf_dir, "documents")
    from ice_spark.functions.text import tokens

    prefix_fp = F.aggregate(
        F.transform(F.slice(tokens(F.col("text")), 1, 8), char_hash),
        F.lit(7).cast("long"),
        lambda acc, h: (acc * 1000003 + h) % 1_000_000_007,
    )
    # A boilerplate 8-token opening shared by p docs is p²/2 pairs
    # under one fp key — same skew class as the shingle postings, so
    # same cap (no-op at every test SF: max fp group is 4 even on the
    # 50x probe corpus).
    fps = cap_postings(
        docs.select("doc_id", "source", prefix_fp.alias("fp")), ["fp"]
    )
    a = fps.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("source_a"), F.col("fp")
    )
    b = fps.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("source_b"), F.col("fp").alias("fp_b")
    )
    return (
        a.join(
            b,
            (F.col("fp") == F.col("fp_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("source_a") <= F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            F.countDistinct("fp").alias("n_shared_texts"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "t14_vocabulary_growth",
    f"""
    WITH firstseen AS (
      SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS t FROM documents),
           UNNEST(t) AS u(tok)
      GROUP BY tok
    ),
    toks_per_doc AS (
      SELECT doc_id, len({_SQL_TOKS.format(col='text')}) AS n FROM documents
    ),
    milestones AS (SELECT UNNEST([100, 200, 300, 400, 500]) AS m)
    SELECT m AS docs_seen,
           (SELECT CAST(SUM(n) AS BIGINT) FROM toks_per_doc WHERE doc_id < m)
             AS tokens_seen,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM firstseen WHERE first_doc < m)
             AS vocab_size
    FROM milestones
    ORDER BY docs_seen
    """,
    doc="Vocabulary growth curve (Heaps' law measurement): distinct "
    "vocabulary after the first 100..500 documents, computed from "
    "each token's FIRST-SEEN doc id — one explode + min per token, "
    "then every milestone is a bounded filter over the vocab "
    "relation, instead of re-scanning the corpus per milestone. The "
    "corpus-analysis artifact that calibrates tokenizer vocab sizes "
    "and dedup aggressiveness; sublinear curve growth is the "
    "expected shape, a linear curve flags synthetic/unmixed data.",
)
def t14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    fs = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .cache()
    )
    tpd = docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).cache()
    ms = spark.createDataFrame([(m,) for m in (100, 200, 300, 400, 500)], ["docs_seen"])
    tok_seen = (
        ms.join(tpd, F.col("doc_id") < F.col("docs_seen"))
        .groupBy("docs_seen")
        .agg(F.sum("n").cast("long").alias("tokens_seen"))
    )
    vocab = (
        ms.join(fs, F.col("first_doc") < F.col("docs_seen"))
        .groupBy("docs_seen")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    return (
        tok_seen.join(vocab, "docs_seen")
        .select(F.col("docs_seen").cast("long").alias("docs_seen"), "tokens_seen", "vocab_size")
        .orderBy("docs_seen")
    )


@register(
    "t15_repetition_scores",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS t FROM documents),
    bg AS (
      SELECT doc_id, UNNEST(list_transform(generate_series(1, len(t)-1),
             i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks WHERE len(t) >= 2
    ),
    bcnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    bagg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(MAX(c) AS BIGINT) AS top_c,
             CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup_c
      FROM bcnt GROUP BY 1
    ),
    tg AS (
      SELECT doc_id, UNNEST(list_transform(generate_series(1, len(t)-2),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks WHERE len(t) >= 3
    ),
    tcnt AS (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2),
    tagg AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_trigrams,
             CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup_c3
      FROM tcnt GROUP BY 1
    )
    SELECT b.doc_id, b.n_bigrams,
           ROUND(CAST(b.top_c AS DOUBLE) / b.n_bigrams, 6) AS top_bigram_frac,
           ROUND(CAST(b.dup_c AS DOUBLE) / b.n_bigrams, 6) AS dup_bigram_frac,
           ROUND(CAST(COALESCE(t.dup_c3, 0) AS DOUBLE)
                 / CASE WHEN t.n_trigrams IS NULL OR t.n_trigrams = 0
                        THEN 1 ELSE t.n_trigrams END, 6) AS dup_trigram_frac,
           CAST(CASE WHEN CAST(b.top_c AS DOUBLE) / b.n_bigrams > 0.08
                       OR CAST(b.dup_c AS DOUBLE) / b.n_bigrams > 0.18
                     THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM bagg b LEFT JOIN tagg t ON b.doc_id = t.doc_id
    """,
    doc="Within-document repetition scores — the Gopher/MassiveText "
    "repetition-filter family (Rae et al. 2021, table A1), adapted "
    "to token-occurrence fractions since this corpus has no "
    "line/paragraph structure: per doc, the fraction of bigram "
    "occurrences claimed by the single most frequent bigram "
    "(top_bigram_frac; Gopher's top-n-gram rule), and the fraction "
    "of bigram/trigram occurrences whose gram repeats within the "
    "document (dup_*_frac; Gopher's duplicate-n-gram rule). The "
    "`flagged` column applies illustrative thresholds (0.08 / 0.18 "
    "— Gopher's published cutoffs are character-fraction based; "
    "documented deviation). Shape at 100 TB: explode + two "
    "(doc_id, gram)-keyed hash aggregations per n — map-side "
    "combine does most of the work because grams repeat within a "
    "partition, the shuffle key space is per-doc so there is no hot "
    "key by construction, and the result is one row per document.",
)
def t15(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(T.tokens_sql("text")).alias("t")
    )

    def gram_agg(n: int, names: tuple[str, str, str]) -> DataFrame:
        total, top, dup = names
        grams = docs.where(F.expr(f"size(t) >= {n}")).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {n - 1}), "
                    f"i -> concat_ws(' ', slice(t, i, {n})))"
                )
            ).alias("g"),
        )
        cnt = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        return cnt.groupBy("doc_id").agg(
            F.sum("c").cast("long").alias(total),
            F.max("c").cast("long").alias(top),
            F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
            .cast("long")
            .alias(dup),
        )

    b = gram_agg(2, ("n_bigrams", "top_c", "dup_c"))
    t3 = gram_agg(3, ("n_trigrams", "top_c3", "dup_c3")).select(
        F.col("doc_id").alias("t_doc"), "n_trigrams", "dup_c3"
    )
    top_frac = F.col("top_c").cast("double") / F.col("n_bigrams")
    dup_frac = F.col("dup_c").cast("double") / F.col("n_bigrams")
    tri_total = F.when(
        F.col("n_trigrams").isNull() | (F.col("n_trigrams") == 0), F.lit(1)
    ).otherwise(F.col("n_trigrams"))
    return (
        b.join(t3, b.doc_id == F.col("t_doc"), "left")
        .select(
            "doc_id",
            "n_bigrams",
            F.round(top_frac, 6).alias("top_bigram_frac"),
            F.round(dup_frac, 6).alias("dup_bigram_frac"),
            F.round(
                F.coalesce(F.col("dup_c3"), F.lit(0)).cast("double") / tri_total, 6
            ).alias("dup_trigram_frac"),
            F.when((top_frac > 0.08) | (dup_frac > 0.18), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("flagged"),
        )
    )


@register(
    "d16_dedup_policy_simulator",
    f"""
    WITH RECURSIVE
    base AS (
      SELECT doc_id, len({_SQL_TOKS.format(col='text')}) AS n_toks
      FROM documents
    ),
    {_SQL_NEARDUP_EDGES},
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
    near_drop AS (SELECT doc_id FROM comp WHERE doc_id <> rep),
    short_drop AS (SELECT doc_id FROM base WHERE n_toks < 20)
    SELECT policy, n_docs, total_tokens,
           (SELECT CAST(SUM(n_toks) AS BIGINT) FROM base) - total_tokens
             AS tokens_removed
    FROM (
      SELECT 'a_none' AS policy, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS total_tokens FROM base
      UNION ALL
      SELECT 'b_near_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_toks) AS BIGINT)
      FROM base WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
      UNION ALL
      SELECT 'c_quality', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_toks) AS BIGINT)
      FROM base WHERE doc_id NOT IN (SELECT doc_id FROM short_drop)
      UNION ALL
      SELECT 'd_near_dedup_plus_quality', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(n_toks) AS BIGINT)
      FROM base WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
                  AND doc_id NOT IN (SELECT doc_id FROM short_drop)
    )
    ORDER BY policy
    """,
    doc="Dedup-policy simulator: the surviving corpus (docs and "
    "tokens) under four cleaning policies — none, near-dup removal "
    "(d06's connected components, keep the min-id representative), "
    "short-doc quality filter, and both — in one comparison table. "
    "The what-if a data-curation team runs before committing a "
    "policy; each policy is an anti-join against a drop set already "
    "bounded by the dedup pipeline's own output. Token totals are "
    "exact integers, so the removed-token costs are comparable to "
    "the cent.",
)
def d16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.functions.text import token_count
    from ice_spark.operators.cluster import alternating_star_components
    from ice_spark.queries.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", token_count(F.col("text")).alias("n_toks")).cache()
    pairs = QUERIES["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    comp = alternating_star_components(pairs, "doc_a", "doc_b")
    near_drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    short_drop = base.where(F.col("n_toks") < 20).select("doc_id")

    def pol(name, df):
        return df.agg(
            F.lit(name).alias("policy"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
        ).select("policy", "n_docs", "total_tokens")

    all_tokens = base.agg(F.sum("n_toks").cast("long").alias("at"))
    out = (
        pol("a_none", base)
        .unionAll(pol("b_near_dedup", base.join(near_drop, "doc_id", "left_anti")))
        .unionAll(pol("c_quality", base.join(short_drop, "doc_id", "left_anti")))
        .unionAll(
            pol(
                "d_near_dedup_plus_quality",
                base.join(near_drop, "doc_id", "left_anti").join(
                    short_drop, "doc_id", "left_anti"
                ),
            )
        )
    )
    return (
        out.crossJoin(F.broadcast(all_tokens))
        .select(
            "policy",
            "n_docs",
            "total_tokens",
            (F.col("at") - F.col("total_tokens")).alias("tokens_removed"),
        )
        .orderBy("policy")
    )


# Positional 8-token span hashes (mirrors functions.text.span_hashes_sql):
# pos is the 1-based index of the span's first token; th[pos:pos+7] is the
# DuckDB inclusive slice of the 8 token hashes the span covers.
_SQL_SPAN8 = (
    "list_reduce(list_prepend(CAST(7 AS BIGINT), th[i:i+7]), "
    "(a, b) -> (a * 1000003 + b) % 1000000007)"
)


@register(
    "d18_duplicate_spans",
    f"""
    WITH th AS (
      SELECT doc_id, source, {_SQL_TOKH} AS th
      FROM (SELECT doc_id, source, {_SQL_TOKS.format(col='text')} AS toks
            FROM documents)
    ),
    sp AS (
      SELECT doc_id, source,
             UNNEST(generate_series(1, len(th) - 7)) AS pos,
             UNNEST(list_transform(generate_series(1, len(th) - 7),
                    i -> {_SQL_SPAN8})) AS h
      FROM th WHERE len(th) >= 8
    ),
    dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    occ AS (SELECT doc_id, source, pos, h FROM sp JOIN dup USING (h)),
    cov AS (
      SELECT doc_id, source, pos, h,
             GREATEST(0, (pos + 7) - GREATEST(pos - 1,
               COALESCE(MAX(pos + 7) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
               AS contrib
      FROM occ
    ),
    agg AS (
      SELECT source,
             COUNT(DISTINCT doc_id) AS n_dup_docs,
             CAST(COUNT(*) AS BIGINT) AS dup_span_occurrences,
             COUNT(DISTINCT h) AS distinct_dup_spans,
             CAST(SUM(contrib) AS BIGINT) AS covered_tokens
      FROM cov GROUP BY source
    ),
    base AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({_SQL_TOKS.format(col='text')})) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY source
    )
    SELECT b.source, b.n_docs,
           CAST(COALESCE(a.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
           CAST(COALESCE(a.dup_span_occurrences, 0) AS BIGINT)
             AS dup_span_occurrences,
           CAST(COALESCE(a.distinct_dup_spans, 0) AS BIGINT)
             AS distinct_dup_spans,
           CAST(COALESCE(a.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           b.total_tokens,
           ROUND(CAST(COALESCE(a.covered_tokens, 0) AS DOUBLE)
                 / GREATEST(b.total_tokens, 1), 6) AS coverage_ratio
    FROM base b LEFT JOIN agg a ON b.source = a.source
    """,
    doc="Exact-substring duplicate-span audit (the ExactSubstr dedup "
    "family, Lee et al. 2022 'Deduplicating Training Data Makes "
    "Language Models Better'): every 8-token window is rolling-"
    "hashed WITH its position, windows whose hash appears in >= 2 "
    "distinct documents are duplicate spans, and per source the "
    "query reports how many docs carry one, the occurrence/distinct "
    "span counts, and the fraction of token positions covered by at "
    "least one duplicated span (interval-union via a per-doc "
    "running-max window, NOT a w-times position explode). This is "
    "the substring-level complement to the document-level d02/d04 "
    "family: it measures how much text a suffix-array-style span "
    "deduper would cut. Shape at 100 TB: hashing is map-side "
    "O(tokens*8); the dup-hash groupBy and the occ join are both "
    "keyed on the 8-byte span hash (linear posting lists, never "
    "pair enumeration, so a hot boilerplate span costs rows not "
    "rows^2); the coverage window partitions by doc_id — per-doc "
    "key space, no hot key by construction.",
)
def d18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    W = 8
    docs = load_table(spark, sf_dir, "documents")
    sp = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(T.span_hashes_arrow("text", W)).alias("pos0", "h"),
        )
        .select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "h")
        .localCheckpoint(eager=False)
    )
    # Span hashes with >= 2 distinct docs. Grows with the corpus, so
    # the membership join is pinned to sort-merge (the g01/g02
    # lesson: AQE's post-agg size estimate promoted this side to a
    # broadcast at the 100x probe corpus and the deserialized
    # build map OOMed the driver; merge spills and AQE can still
    # skew-split it). Semi join: dup is distinct on h, we only
    # filter.
    dup = (
        sp.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    occ = sp.join(dup.hint("merge"), "h", "semi").select("doc_id", "source", "pos", "h")
    prev_end = F.max(F.col("pos") + (W - 1)).over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0),
        (F.col("pos") + (W - 1))
        - F.greatest(F.col("pos") - 1, F.coalesce(prev_end, F.lit(0))),
    )
    agg = (
        occ.withColumn("contrib", contrib)
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("a_dup_docs"),
            F.count(F.lit(1)).alias("a_occ"),
            F.count_distinct("h").alias("a_spans"),
            F.sum("contrib").alias("a_cov"),
        )
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.tokens(F.col("text")))).cast("long").alias("total_tokens"),
    )
    cov = F.coalesce(F.col("a_cov"), F.lit(0)).cast("long")
    return base.join(agg, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("a_dup_docs"), F.lit(0)).cast("long").alias("n_dup_docs"),
        F.coalesce(F.col("a_occ"), F.lit(0)).cast("long").alias("dup_span_occurrences"),
        F.coalesce(F.col("a_spans"), F.lit(0)).cast("long").alias("distinct_dup_spans"),
        cov.alias("covered_tokens"),
        "total_tokens",
        F.round(
            cov.cast("double") / F.greatest(F.col("total_tokens"), F.lit(1)), 6
        ).alias("coverage_ratio"),
    )


@register(
    "d19_span_dedup_cut",
    f"""
    WITH th AS (
      SELECT doc_id, source, {_SQL_TOKH} AS th
      FROM (SELECT doc_id, source, {_SQL_TOKS.format(col='text')} AS toks
            FROM documents)
    ),
    sp AS (
      SELECT doc_id, source,
             UNNEST(generate_series(1, len(th) - 7)) AS pos,
             UNNEST(list_transform(generate_series(1, len(th) - 7),
                    i -> {_SQL_SPAN8})) AS h
      FROM th WHERE len(th) >= 8
    ),
    dup AS (SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    occ AS (SELECT doc_id, source, pos, h FROM sp JOIN dup USING (h)),
    k1 AS (SELECT h, MIN(doc_id) AS d0 FROM occ GROUP BY h),
    k2 AS (
      SELECT o.h, o.doc_id AS d0, MIN(o.pos) AS p0
      FROM occ o JOIN k1 ON o.h = k1.h AND o.doc_id = k1.d0
      GROUP BY o.h, o.doc_id
    ),
    cut AS (
      SELECT o.doc_id, o.source, o.pos
      FROM occ o JOIN k2 ON o.h = k2.h
      WHERE NOT (o.doc_id = k2.d0 AND o.pos = k2.p0)
    ),
    cov AS (
      SELECT doc_id, source, pos,
             GREATEST(0, (pos + 7) - GREATEST(pos - 1,
               COALESCE(MAX(pos + 7) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
               AS contrib
      FROM cut
    ),
    agg AS (
      SELECT source,
             COUNT(DISTINCT doc_id) AS docs_cut,
             CAST(COUNT(*) AS BIGINT) AS cut_occurrences,
             CAST(SUM(contrib) AS BIGINT) AS tokens_cut
      FROM cov GROUP BY source
    ),
    base AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({_SQL_TOKS.format(col='text')})) AS BIGINT)
               AS total_tokens
      FROM documents GROUP BY source
    )
    SELECT b.source, b.n_docs,
           CAST(COALESCE(a.docs_cut, 0) AS BIGINT) AS docs_cut,
           CAST(COALESCE(a.cut_occurrences, 0) AS BIGINT) AS cut_occurrences,
           CAST(COALESCE(a.tokens_cut, 0) AS BIGINT) AS tokens_cut,
           b.total_tokens,
           ROUND(CAST(1 AS DOUBLE) - CAST(COALESCE(a.tokens_cut, 0) AS DOUBLE)
                 / GREATEST(b.total_tokens, 1), 6) AS kept_ratio
    FROM base b LEFT JOIN agg a ON b.source = a.source
    """,
    doc="Exact-substring dedup CUT plan (the action to d18's audit, "
    "Lee et al. 2022 ExactSubstr semantics): for every duplicated "
    "8-token span the globally first occurrence — smallest doc_id, "
    "then smallest position — is the keeper, every other occurrence "
    "(including later repeats inside the keeper document itself) is "
    "cut, and the per-source summary reports docs touched, cut "
    "occurrences, tokens removed (interval-union of the cut spans), "
    "and the surviving-token ratio. Keeper selection is two keyed "
    "aggregations (min doc per hash, then min pos within that doc) "
    "— never a row_number window over the posting list, so a hot "
    "boilerplate span costs two linear passes, not a single-task "
    "sort, and never an (id*K + pos) key encoding, which is exactly "
    "the 2^63 overflow trap the d08 split hash hit at "
    "snowflake-scale ids. All joins are keyed on the 8-byte span "
    "hash with the growing side merge-pinned (the d18/g01 AQE-"
    "broadcast lesson).",
)
def d19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    W = 8
    docs = load_table(spark, sf_dir, "documents")
    sp = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(T.span_hashes_arrow("text", W)).alias("pos0", "h"),
        )
        .select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "h")
        .localCheckpoint(eager=False)
    )
    dup = (
        sp.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    occ = (
        sp.join(dup.hint("merge"), "h", "semi")
        .select("doc_id", "source", "pos", "h")
        .localCheckpoint(eager=False)
    )
    k1 = (
        occ.groupBy("h")
        .agg(F.min("doc_id").alias("d0"))
        .select(F.col("h").alias("h1"), "d0")
    )
    k2 = (
        occ.join(
            k1.hint("merge"),
            (F.col("h") == F.col("h1")) & (F.col("doc_id") == F.col("d0")),
        )
        .groupBy(F.col("h1").alias("kh"), "d0")
        .agg(F.min("pos").alias("p0"))
    )
    cut = occ.join(k2.hint("merge"), F.col("h") == F.col("kh")).where(
        ~((F.col("doc_id") == F.col("d0")) & (F.col("pos") == F.col("p0")))
    )
    prev_end = F.max(F.col("pos") + (W - 1)).over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0),
        (F.col("pos") + (W - 1))
        - F.greatest(F.col("pos") - 1, F.coalesce(prev_end, F.lit(0))),
    )
    agg = (
        cut.select("doc_id", "source", "pos")
        .withColumn("contrib", contrib)
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("a_docs"),
            F.count(F.lit(1)).alias("a_occ"),
            F.sum("contrib").alias("a_cut"),
        )
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.tokens(F.col("text")))).cast("long").alias("total_tokens"),
    )
    tc = F.coalesce(F.col("a_cut"), F.lit(0)).cast("long")
    return base.join(agg, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("a_docs"), F.lit(0)).cast("long").alias("docs_cut"),
        F.coalesce(F.col("a_occ"), F.lit(0)).cast("long").alias("cut_occurrences"),
        tc.alias("tokens_cut"),
        "total_tokens",
        F.round(
            F.lit(1.0) - tc.cast("double") / F.greatest(F.col("total_tokens"), F.lit(1)),
            6,
        ).alias("kept_ratio"),
    )


@register(
    "s14_balanced_shards",
    f"""
    WITH d AS (
      SELECT doc_id, len({_SQL_TOKS.format(col='text')}) AS n_toks
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_toks,
             ROW_NUMBER() OVER (ORDER BY n_toks DESC, doc_id) AS rn
      FROM d
    )
    SELECT CAST((rn - 1) % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(MAX(n_toks) AS BIGINT) AS max_doc_tokens,
           CAST(MIN(n_toks) AS BIGINT) AS min_doc_tokens
    FROM r
    GROUP BY 1
    ORDER BY shard
    """,
    doc="Deterministic size-balanced shard assignment for training "
    "export (the LPT-flavored heuristic: rank every document by "
    "descending token count with doc_id tiebreak, deal rank r to "
    "shard (r-1) mod 8 — round-robin over the sorted order keeps "
    "every shard within one document of even token mass, and the "
    "assignment is a pure function of the corpus, so re-runs and "
    "engines agree). The global rank comes from "
    "operators/ranking.with_global_rank — repartitionByRange + "
    "per-partition row numbers + broadcast partition offsets on a "
    "checkpointed relation — never a single-task ORDER BY window; "
    "the only other cost is one shard-keyed aggregation of 8 "
    "groups. At 100 TB: one range exchange of (doc_id, n_toks) "
    "pairs (16 bytes/row, not document bodies) + a map-side-"
    "combined 8-group agg.",
)
def s14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.ranking import with_global_rank

    K = 8
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(T.tokens(F.col("text"))).alias("n_toks")
    )
    r = with_global_rank(d, [F.col("n_toks").desc(), F.col("doc_id")], "rn")
    return (
        r.select(((F.col("rn") - 1) % K).cast("long").alias("shard"), "n_toks")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.max("n_toks").cast("long").alias("max_doc_tokens"),
            F.min("n_toks").cast("long").alias("min_doc_tokens"),
        )
        .orderBy("shard")
    )


# p04 wraps d17's gated audit verbatim (the oracle string below embeds
# the FROZEN d17 oracle unchanged via the registry) and turns it into
# the corpus-health row a release pipeline acts on.
from ice_spark.queries.registry import QUERIES as _QUERIES  # noqa: E402

_D17_ORACLE = _QUERIES["d17_dropped_posting_mass"].oracle

_P04_RECALL_RISK = (
    "recall-risk: capped index drops candidate pairs; "
    "use minhash-lsh (d04/s13) or span-cut (d19)"
)
_P04_OK = "ok: cap drops under 1% of posting rows"


@register(
    "p04_corpus_health_card",
    f"""
    WITH audit AS ({_D17_ORACLE})
    SELECT index_name, cap, buckets_over_cap, dropped_posting_rows,
           dropped_pair_mass, total_posting_rows,
           CAST(COALESCE(dropped_posting_rows * 10000
                // NULLIF(total_posting_rows, 0), 0) AS BIGINT) AS dropped_bp,
           CASE WHEN COALESCE(dropped_posting_rows * 10000
                     // NULLIF(total_posting_rows, 0), 0) >= 100
                THEN '{_P04_RECALL_RISK}'
                ELSE '{_P04_OK}' END AS recommendation
    FROM audit
    ORDER BY index_name, cap
    """,
    doc="Corpus health card: d17's dropped-posting-mass audit promoted "
    "to the pipeline's decision row. p01/p02 (and build-corpus) "
    "compose CAPPED near-dup finders; this card consumes the cap "
    "audit they point at and emits, per posting index and cap, the "
    "dropped share in basis points plus an explicit recommendation — "
    "a dup-heavy corpus automatically surfaces 'recall-risk: use "
    "minhash-lsh (d04/s13) or span-cut (d19)' instead of silently "
    "shipping a zero-recall dedup (the r8 regime finding as pipeline "
    "output; at the sf5 probe corpus the cap-512 shingle row crosses "
    "the 1% threshold with 49% of posting rows dropped). Same shape "
    "as d17 — one vocabulary-keyed shuffle, O(#caps) report rows — "
    "plus integer basis-point arithmetic both engines replay "
    "exactly. Observability-first posture per the reference's "
    "metrics docs (ice/examples/grafana/METRICS.md).",
)
def p04(spark: SparkSession, sf_dir: str) -> DataFrame:
    audit = d17(spark, sf_dir)
    dropped_bp = F.coalesce(
        F.expr(
            "CAST(dropped_posting_rows * 10000 "
            "div nullif(total_posting_rows, 0) AS BIGINT)"
        ),
        F.lit(0).cast("long"),
    )
    out = audit.withColumn("dropped_bp", dropped_bp)
    return out.withColumn(
        "recommendation",
        F.when(F.col("dropped_bp") >= 100, F.lit(_P04_RECALL_RISK)).otherwise(
            F.lit(_P04_OK)
        ),
    ).orderBy("index_name", "cap")


@register(
    "d20_span_incremental_admission",
    f"""
    WITH th AS (
      SELECT doc_id, source, doc_id % 10 = 0 AS is_batch, {_SQL_TOKH} AS th
      FROM (SELECT doc_id, source, {_SQL_TOKS.format(col='text')} AS toks
            FROM documents)
    ),
    sp AS (
      SELECT doc_id, is_batch,
             UNNEST(generate_series(1, len(th) - 7)) AS pos,
             UNNEST(list_transform(generate_series(1, len(th) - 7),
                    i -> {_SQL_SPAN8})) AS h
      FROM th WHERE len(th) >= 8
    ),
    idx AS (SELECT DISTINCT h FROM sp WHERE NOT is_batch),
    occ AS (SELECT doc_id, pos FROM sp JOIN idx USING (h) WHERE is_batch),
    cov AS (
      SELECT doc_id, pos,
             GREATEST(0, (pos + 7) - GREATEST(pos - 1,
               COALESCE(MAX(pos + 7) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
               AS contrib
      FROM occ
    ),
    perdoc AS (
      SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS covered
      FROM cov GROUP BY doc_id
    ),
    dec AS (
      SELECT t.doc_id, t.source,
             CAST(len(t.th) AS BIGINT) AS n_toks,
             COALESCE(p.covered, 0) AS covered,
             COALESCE(p.covered, 0) * 10000
               // GREATEST(CAST(len(t.th) AS BIGINT), 1) < 5000 AS admitted
      FROM th t LEFT JOIN perdoc p ON t.doc_id = p.doc_id
      WHERE t.is_batch
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_batch_docs,
           CAST(COUNT(*) FILTER (WHERE admitted) AS BIGINT) AS docs_admitted,
           CAST(COUNT(*) FILTER (WHERE NOT admitted) AS BIGINT) AS docs_rejected,
           CAST(SUM(covered) AS BIGINT) AS covered_tokens,
           CAST(SUM(n_toks) AS BIGINT) AS batch_tokens,
           CAST(SUM(covered) * 10000 // GREATEST(SUM(n_toks), 1) AS BIGINT)
             AS covered_bp
    FROM dec
    GROUP BY source
    ORDER BY source
    """,
    doc="Span-level incremental admission (the substring analog of "
    "d11's document-level gate, the operator a continuously-"
    "ingesting pipeline runs daily): the standing corpus (doc_id % "
    "10 <> 0) contributes its DISTINCT 8-token span-hash index — "
    "d18's index as the standing side — and each incoming batch "
    "document (doc_id % 10 = 0) is admitted only while under 50% of "
    "its tokens are covered by corpus spans (interval-union "
    "coverage, the d18/d19 running-max form). Reports per-source "
    "admit/reject counts and covered token mass in exact integer "
    "basis points. Scale: one distinct over corpus span hashes (8 "
    "bytes per unique span, stored in production), one merge-pinned "
    "semi join shipping only BATCH spans (the corpus side is "
    "exactly the growing relation AQE mis-broadcast at the 100x "
    "probe for d18/g01), one per-batch-doc bounded window. "
    "operators/dedup.span_incremental_admission is the reusable "
    "entry point.",
)
def d20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import span_incremental_admission

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    dec = span_incremental_admission(
        corpus, batch, id_col="doc_id", text_col="text", w=8, reject_bp=5000
    )
    src = batch.select("doc_id", "source")
    return (
        dec.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch_docs"),
            F.sum(F.when(F.col("admitted"), 1).otherwise(0))
            .cast("long")
            .alias("docs_admitted"),
            F.sum(F.when(~F.col("admitted"), 1).otherwise(0))
            .cast("long")
            .alias("docs_rejected"),
            F.sum("covered_tokens").cast("long").alias("covered_tokens"),
            F.sum("n_toks").cast("long").alias("batch_tokens"),
            F.expr(
                "CAST(sum(covered_tokens) * 10000 "
                "div greatest(sum(n_toks), 1) AS BIGINT)"
            ).alias("covered_bp"),
        )
        .orderBy("source")
    )


@register(
    "t16_dsir_importance_weights",
    f"""
    WITH th AS (
      SELECT doc_id, lang = 'en' AS is_t, {_SQL_TOKH} AS th
      FROM (SELECT doc_id, lang, {_SQL_TOKS.format(col='text')} AS toks
            FROM documents)
    ),
    feat AS (
      SELECT doc_id, is_t, f % 4096 AS b
      FROM th, UNNEST(list_concat(
        th.th,
        CASE WHEN len(th.th) >= 2 THEN
          list_transform(generate_series(1, len(th.th) - 1),
            i -> ((7 * 1000003 + th.th[i]) % 1000000007 * 1000003
                  + th.th[i+1]) % 1000000007)
        ELSE []::BIGINT[] END)) AS u(f)
    ),
    stats AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c_r,
             CAST(COUNT(*) FILTER (WHERE is_t) AS BIGINT) AS c_t
      FROM feat GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(c_r) AS BIGINT) AS t_r, CAST(SUM(c_t) AS BIGINT) AS t_t
      FROM stats
    ),
    ratio AS (
      SELECT b,
             CAST(ROUND(LN(CAST((c_t + 1) * (t_r + 4096) AS DOUBLE)
                           / CAST((c_r + 1) * (t_t + 4096) AS DOUBLE))
                        * 1000000, 0) AS BIGINT) AS r_micro
      FROM stats, tot
    ),
    dfc AS (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM feat GROUP BY doc_id, b
    ),
    perdoc AS (
      SELECT d.doc_id, CAST(SUM(d.c) AS BIGINT) AS n_feats,
             CAST(SUM(d.c * r.r_micro) AS BIGINT) AS w_micro
      FROM dfc d JOIN ratio r ON d.b = r.b
      GROUP BY d.doc_id
    )
    SELECT doc.doc_id,
           COALESCE(p.n_feats, 0) AS n_feats,
           CAST(COALESCE(p.w_micro, 0) AS DOUBLE) / CAST(1000000 AS DOUBLE)
             AS log_w,
           CAST(CASE WHEN COALESCE(p.w_micro, 0) > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS selected
    FROM documents doc LEFT JOIN perdoc p ON doc.doc_id = p.doc_id
    """,
    doc="DSIR-style importance weights (Xie et al. 2023, Data "
    "Selection via Importance Resampling): hashed n-gram features "
    "(unigram token hashes + width-2 polynomial bigram hashes, the "
    "repo hash spec, folded into 4096 buckets), a bag-of-buckets "
    "model for the TARGET distribution (lang='en', standing in for "
    "the paper's Wikipedia+books) and the RAW corpus, and per-doc "
    "log importance weight sum_b count_b * ln(p_target(b)/p_raw(b)) "
    "with add-one smoothing. `selected` marks docs more target-like "
    "than raw-like (log_w > 0) — the deterministic counterpart of "
    "the paper's Gumbel-top-k resampling (documented deviation: no "
    "sampling noise, so the oracle replays exactly). Numeric parity "
    "discipline: each bucket's log-ratio is quantized ONCE to "
    "integer micro-nats from an exact BIGINT-product argument, "
    "per-doc weights are pure BIGINT arithmetic, and the single "
    "double division happens at the end — the t08 rule. Shape at "
    "100 TB: the feature stream is explode + two keyed hash aggs "
    "(map-side combine; keys are per-doc or one of 4096 buckets), "
    "the bucket model is <=4096 rows BROADCAST to the weight join, "
    "and no window or driver loop appears anywhere — importance "
    "weighting an arbitrarily large corpus is one shuffle of "
    "(doc_id, bucket) pairs.",
)
def t16(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = 4096
    docs = load_table(spark, sf_dir, "documents")
    th = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_t"),
        T.token_hashes_arrow("text").alias("th"),
    )
    bi = (
        "CASE WHEN size(th) >= 2 THEN "
        "transform(sequence(0, size(th) - 2), "
        "i -> ((7 * 1000003 + element_at(th, CAST(i + 1 AS INT))) % 1000000007 "
        "* 1000003 + element_at(th, CAST(i + 2 AS INT))) % 1000000007) "
        "ELSE CAST(array() AS array<bigint>) END"
    )
    feat = th.select(
        "doc_id",
        "is_t",
        F.explode(F.expr(f"transform(concat(th, {bi}), h -> h % {B})")).alias("b"),
    )
    stats = feat.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("c_r"),
        F.sum(F.col("is_t").cast("long")).cast("long").alias("c_t"),
    )
    tot = stats.agg(
        F.sum("c_r").cast("long").alias("t_r"),
        F.sum("c_t").cast("long").alias("t_t"),
    )
    ratio = stats.crossJoin(F.broadcast(tot)).select(
        "b",
        # decimal(38,0) for the smoothed-ratio cross terms: bucket
        # count x corpus total clears int64 at 100x counts
        # (lint_overflow's class). The decimal product is the same
        # exact integer, so the DOUBLE argument to LN is unchanged.
        F.expr(
            f"CAST(ROUND(LN("
            f"CAST(CAST(c_t + 1 AS DECIMAL(38,0)) * (t_r + {B}) AS DOUBLE) "
            f"/ CAST(CAST(c_r + 1 AS DECIMAL(38,0)) * (t_t + {B}) AS DOUBLE)"
            f") * 1000000, 0) AS BIGINT)"
        ).alias("r_micro"),
    )
    dfc = feat.groupBy("doc_id", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    perdoc = (
        dfc.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            # c*r_micro is per-doc bounded (c <= the doc's own token
            # count), but decimal costs nothing and keeps the overflow
            # lint clean without an allowlist entry
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("r_micro"))
            .cast("long")
            .alias("w_micro"),
        )
    )
    return docs.select("doc_id").join(perdoc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        (
            F.coalesce(F.col("w_micro"), F.lit(0)).cast("double")
            / F.lit(1000000).cast("double")
        ).alias("log_w"),
        F.when(F.coalesce(F.col("w_micro"), F.lit(0)) > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("selected"),
    )


_P05_CAPS = [4, 512]


def _p05_oracle() -> str:
    # The LSH-route pair set is the FROZEN d04 oracle embedded verbatim
    # via the registry (the p04 idiom), so the router's full-recall
    # branch replays the identical banding spec bit-for-bit.
    d04 = _QUERIES["d04_minhash_lsh_pairs"].oracle
    caps = ", ".join(str(c) for c in _P05_CAPS)
    return f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLE_HASHES} AS sh
      FROM (SELECT doc_id, {_SQL_TOKH} AS th
            FROM (SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks
                  FROM documents))
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
    scounts AS (SELECT s, COUNT(*) AS b FROM ex GROUP BY s),
    caps AS (SELECT CAST(unnest([{caps}]) AS BIGINT) AS cap),
    route AS (
      SELECT cap, dropped_bp,
             CASE WHEN dropped_bp >= 100 THEN 'minhash-lsh'
                  ELSE 'capped-shingle' END AS route
      FROM (
        SELECT cap,
               CAST(COALESCE(SUM(b) FILTER (WHERE b > cap), 0) * 10000
                    // NULLIF(SUM(b), 0) AS BIGINT) AS dropped_bp
        FROM scounts, caps GROUP BY cap
      )
    ),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    cex AS (
      SELECT r.cap, e.doc_id, e.s
      FROM route r JOIN scounts c ON c.b <= r.cap JOIN ex e ON e.s = c.s
      WHERE r.route = 'capped-shingle'
    ),
    cpairs AS (
      SELECT a.cap, a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM cex a JOIN cex b
        ON a.cap = b.cap AND a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    ),
    cdrop AS (
      SELECT p.cap, p.doc_b
      FROM cpairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
      WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.8
    ),
    lsh AS (SELECT doc_b FROM ({d04})),
    dropped AS (
      SELECT DISTINCT cap, doc_b FROM cdrop
      UNION
      SELECT DISTINCT r.cap, l.doc_b
      FROM route r JOIN lsh l ON r.route = 'minhash-lsh'
    ),
    tok AS (
      SELECT doc_id, len({_SQL_TOKS.format(col='text')}) AS n_tok
      FROM documents
    ),
    kept AS (
      SELECT r.cap, r.dropped_bp, r.route, t.doc_id, t.n_tok
      FROM route r
      CROSS JOIN tok t
      LEFT JOIN dropped d ON d.cap = r.cap AND d.doc_b = t.doc_id
      WHERE d.doc_b IS NULL
    )
    SELECT cap, dropped_bp, route,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
    FROM kept
    GROUP BY cap, dropped_bp, route
    ORDER BY cap
    """


@register(
    "p05_routed_dedup_pipeline",
    _p05_oracle(),
    doc="Policy-driven dedup routing, EXECUTED end-to-end (closes the "
    "p04 loop: the health card's recommendation is consumed, not "
    "printed): for each audited posting cap, measure the dropped "
    "posting share over the shingle index (d17's audit, the same "
    "vocabulary-keyed shuffle the capped finder pays), route to the "
    "capped containment finder when under 100 bp and to full-recall "
    "banded MinHash-LSH when the cap visibly eats recall, then APPLY "
    "the chosen finder (drop the larger id of every J>=0.8 pair) and "
    "report the kept corpus per cap: docs and token mass. At gate SF "
    "the two caps take DIFFERENT routes (cap 4 ~3% dropped -> lsh; "
    "cap 512 0 bp -> capped), so the oracle verifies both branches "
    "and the flip itself. The acting operators are "
    "operators/pipeline.dedup_route_audit + near_dedup (the "
    "build-corpus --dedup auto path); the audit collect is O(#caps) "
    "rows at any corpus size. Scale: both branches are bucketed "
    "candidate joins, never all-pairs; the route decision costs one "
    "aggregate over posting counts the finder needs anyway.",
)
def p05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.dedup import (
        minhash_lsh_pairs,
        shingle_jaccard_pairs,
    )
    from ice_spark.operators.pipeline import dedup_route_audit

    docs = load_table(spark, sf_dir, "documents")
    # ONE shared lazy-checkpointed (__id, __sh) relation for BOTH
    # finder routes (r13-opt): each finder otherwise materializes its
    # own identical shingle checkpoint, so when the caps take
    # different routes (gate SFs) the corpus shingle pass — the
    # pipeline's most expensive expression — ran and materialized
    # twice. The AUDIT deliberately keeps its own streaming map-side
    # explode instead of reading this relation: extending the share
    # to it was measured and LOST at sf1 (checkpoint IO for the full
    # arrays costs more than the audit's in-scan recompute — the d11
    # lesson; receipts in OPTIMIZATION_r13.md).
    shingled = docs.select(
        F.col("doc_id").alias("__id"),
        T.shingle_hashes("text").alias("__sh"),
    ).localCheckpoint(eager=False)
    # O(len(caps))-row driver collect: the routing decision itself
    # (bounded like the IVF centroid pull; documented ceiling = #caps)
    audit = sorted(
        dedup_route_audit(docs, caps=_P05_CAPS).collect(),
        key=lambda r: r["cap"],
    )
    tok = docs.select("doc_id", T.token_count("text").alias("n_tok"))
    frames = []
    # The LSH finder takes no cap parameter, so its drop set is
    # IDENTICAL for every cap routed to it — compute it once and
    # persist (DISK_ONLY, same posture as the finders' internals).
    # At the sf10 probe both caps route to lsh and the unshared form
    # paid the full signature+banding pass twice (~2x d04).
    lsh_drop = None
    for row in audit:
        if row["route"] == "capped-shingle":
            drop = (
                shingle_jaccard_pairs(
                    docs, max_posting=row["cap"], shingled=shingled
                )
                .select(F.col("doc_b").alias("doc_id"))
                .distinct()
            )
        else:
            if lsh_drop is None:
                from pyspark import StorageLevel

                lsh_drop = (
                    minhash_lsh_pairs(
                        docs,
                        id_col="doc_id",
                        text_col="text",
                        shingled=shingled.select(
                            "__id", F.col("__sh").alias("__shs")
                        ),
                    )
                    .select(F.col("doc_b").alias("doc_id"))
                    .distinct()
                    .persist(StorageLevel.DISK_ONLY)
                )
            drop = lsh_drop
        kept = tok.join(drop, "doc_id", "left_anti")
        frames.append(
            kept.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
                F.sum("n_tok").cast("long").alias("kept_tokens"),
            ).select(
                F.lit(int(row["cap"])).cast("long").alias("cap"),
                F.lit(int(row["dropped_bp"])).cast("long").alias("dropped_bp"),
                F.lit(row["route"]).alias("route"),
                "n_docs_kept",
                "kept_tokens",
            )
        )
    if not frames:
        # empty corpus → dropped_posting_mass yields no audit rows;
        # return an empty frame with the query's schema instead of
        # IndexError (Spark-side guard only — unreachable at gate SF).
        return spark.createDataFrame(
            [],
            "cap long, dropped_bp long, route string, "
            "n_docs_kept long, kept_tokens long",
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
