"""Similarity search over embedding columns (array<float>).

Beyond-reference capability (the reference stores data; it has no
vector ops). Two paths:

- brute_force_topk: exact cosine top-k. The query set is broadcast
  (it's small by definition); the corpus is scanned once — no
  shuffle at all until the final per-query top-k aggregation. This
  is the correct baseline even at 100 TB when the query set is
  bounded.
- lsh_topk: random-hyperplane LSH bucketing — candidates share a
  sign-bit prefix bucket; exact cosine re-rank within buckets. Turns
  the corpus scan into a bucket-pruned scan for large query sets.

All dot products are Column expressions (zip_with + aggregate), so
they execute in codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _dot_unrolled_sql(a_sql: str, b_sql: str, dim: int) -> str:
    """``_dot`` with the element loop unrolled for a FIXED dimension —
    bit-identical doubles (same left-to-right fold order, same casts),
    whole-stage codegen instead of the interpreted HOF-lambda path
    (the v08/srp_signature_unrolled_sql lesson, guide §4.1: HOF
    lambdas are CodegenFallback). Precondition: both vectors have
    exactly ``dim`` entries (the registry corpus contract); a shorter
    vector fails loudly under ANSI element_at instead of silently
    zip_with-padding."""
    terms = " ".join(
        f"+ CAST(element_at({a_sql}, {d}) AS DOUBLE) "
        f"* CAST(element_at({b_sql}, {d}) AS DOUBLE)"
        for d in range(1, dim + 1)
    )
    return f"(CAST(0 AS DOUBLE) {terms})"


def _norm_unrolled_sql(a_sql: str, dim: int) -> str:
    terms = " ".join(
        f"+ CAST(element_at({a_sql}, {d}) AS DOUBLE) "
        f"* CAST(element_at({a_sql}, {d}) AS DOUBLE)"
        for d in range(1, dim + 1)
    )
    return f"SQRT(CAST(0 AS DOUBLE) {terms})"


def cosine_fixed(a_col: str, b_col: str, dim: int):
    """``cosine`` for a fixed, known vector dimension: identical bits
    (same fold order / cast / division structure), executed in
    whole-stage codegen. Call sites that know the corpus dim (all the
    v-series: the embedding contract is 64) should use this; ``cosine``
    stays as the variable-length reference form."""
    return F.expr(
        f"({_dot_unrolled_sql(a_col, b_col, dim)}"
        f" / ({_norm_unrolled_sql(a_col, dim)} * {_norm_unrolled_sql(b_col, dim)}))"
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank); self-matches are
    excluded when ids collide. Cosine is rounded to 6 digits before
    ranking (ties broken by neighbor id) so results are reproducible.
    `dim`: pass the corpus's fixed vector dimension to score with the
    codegen'd unrolled cosine (bit-identical; see cosine_fixed).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    cos = (
        cosine_fixed("__qv", "__cv", dim)
        if dim
        else cosine(F.col("__qv"), F.col("__cv"))
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (pure python,
    fixed constants — reproducible without RNG state)."""
    vals = []
    x = seed * 2654435761 % 2**32
    for _ in range(dim):
        x = (1103515245 * x + 12345) % 2**31
        vals.append((x / 2**30) - 1.0)  # in [-1, 1)
    return vals


def lsh_bucket(vec_col: str, dim: int, n_planes: int = 8, seed0: int = 1):
    """Sign-bit bucket id from n random hyperplanes (codegen'd expr).

    `seed0` selects the first plane seed so multiple independent
    BANDS can be derived from the same generator (band b at
    seed0 = b * n_planes + 1 uses disjoint planes).

    r14-opt: the per-plane dot products are UNROLLED SQL (identical
    bits — same left-to-right fold over the same double literals, same
    2^p sign weights) instead of interpreted zip_with/aggregate
    lambdas, which cost n_planes * dim CodegenFallback iterations per
    row (guide §4.1; the v08 lesson). Takes the vector COLUMN NAME.
    """
    bits = []
    for p in range(n_planes):
        plane = _hyperplane(dim, seed=seed0 + p)
        terms = " ".join(
            f"+ CAST(element_at({vec_col}, {d + 1}) AS DOUBLE) * {w!r}"
            for d, w in enumerate(plane)
        )
        bits.append(
            f"(CASE WHEN (CAST(0 AS DOUBLE) {terms}) > 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr("(CAST(0 AS BIGINT) + " + " + ".join(bits) + ")")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    dim: int,
    k: int = 3,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket,
    exact cosine re-rank inside. At 100 TB the corpus is bucketed once
    (written bucketed-by bucket id); queries probe only their bucket."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        lsh_bucket(query_vec_col, dim, n_planes).alias("__bq"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_bucket(vec_col, dim, n_planes).alias("__bc"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("__bq") == F.col("__bc")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_fixed("__qv", "__cv", dim), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# --- Signed random projections (SRP / hyperplane LSH) -----------------------
# Rademacher ±1 hyperplanes derived from a portable integer formula,
# so ANY engine (the DuckDB oracle included) reconstructs the exact
# same planes — no floats shipped, no RNG state. Signature bit p is
# sign(Σ_d w(p,d)·x_d); cos-similar vectors agree on most bits, so
# equal signatures are near-duplicate candidates. The projection sum
# folds left-to-right over d in both engines, making even the ==0
# boundary deterministic.

SRP_MOD = 1_000_000_007


def banded_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, *, dim: int, n_planes: int, bands: int
) -> DataFrame:
    """(id, band, key) exploded banded sign-bit bucket relation.

    Band b projects onto planes seeded b*n_planes+1 .. (b+1)*n_planes,
    so bands are independent; one output row per (vector, band). All
    bands are computed in a single projection (array of structs +
    explode) — one corpus scan.
    """
    # All bands*n_planes projections UNROLLED into one codegen'd
    # expression (r14-opt; previously one nested-list plane literal +
    # interpreted HOF lambdas — bands * n_planes * dim = 2048
    # interpreted iterations per row at the v04 call site, the same
    # CodegenFallback pathology as v08's srp path). Identical bits:
    # same plane seeds, the dot folds left-to-right over d with the
    # SAME double literals (repr round-trips through the SQL parser
    # exactly), the band key sums the same 2^p sign-bit weights.
    # Per-plane Column construction was already rejected for py4j cost
    # (~80ms/plane); this builds ONE expr string in ~1ms.
    def band_key_sql(b: int) -> str:
        bits = []
        for p in range(n_planes):
            plane = _hyperplane(dim, seed=b * n_planes + p + 1)
            terms = " ".join(
                f"+ CAST(element_at({vec_col}, {d + 1}) AS DOUBLE) * {w!r}"
                for d, w in enumerate(plane)
            )
            bits.append(
                f"(CASE WHEN (CAST(0 AS DOUBLE) {terms}) > 0 "
                f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        return "(" + " + ".join(bits) + ")"

    keys = F.expr(
        "array(" + ", ".join(band_key_sql(b) for b in range(bands)) + ")"
    )
    return df.select(F.col(id_col), F.posexplode(keys).alias("band", "key"))


def banded_cosine_neardup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    n_planes: int = 8,
    bands: int = 4,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate embedding pairs via banded LSH + exact verify.

    The d04 shape for vectors: candidates are pairs sharing a
    sign-bit bucket in ANY band (equi-join on (band, key), never an
    all-pairs join), buckets above `max_bucket_size` are dropped
    before the self-join (hard per-bucket pair bound; audit dropped
    mass with operators.dedup.lsh_dropped_bucket_mass), and every
    candidate is verified with the exact rounded cosine — so results
    are deterministic and oracle-replayable even though candidate
    generation is approximate. O(candidates) work, O(bands · n)
    bucket rows; survives corpus scale-up where an exact all-pairs
    join is unconditionally quadratic.

    Returns (id_a, id_b, cos_sim) with id_a < id_b, cos >= threshold.
    """
    from ice_spark.operators.dedup import DEFAULT_MAX_BUCKET, _cap_buckets

    cap = DEFAULT_MAX_BUCKET if max_bucket_size is None else max_bucket_size
    # Three consumers (bucket pass + both verify sides): materialize
    # the corpus once, like d02's shingle relation.
    corpus = corpus.select(id_col, vec_col).localCheckpoint(eager=False)
    bk = _cap_buckets(
        banded_lsh_buckets(
            corpus, id_col, vec_col, dim=dim, n_planes=n_planes, bands=bands
        ),
        ["band", "key"],
        cap,
    )
    left = bk.select(F.col(id_col).alias("__ida"), "band", "key")
    right = bk.select(F.col(id_col).alias("__idb"), F.col("band").alias("__band2"), F.col("key").alias("__key2"))
    # MERGE hint: same capped bucket relation both sides, partitioned
    # + sorted on (band, key) by the cap window (see
    # dedup.band_candidates — exchange reused instead of a broadcast
    # rebuild of the banding pipeline at small SFs).
    cand = (
        left.join(
            right.hint("merge"),
            (left.band == right.__band2)
            & (left.key == right.__key2)
            & (F.col("__ida") < F.col("__idb")),
        )
        .select("__ida", "__idb")
        .distinct()
    )
    # No broadcast hints: the corpus sides grow with the data — keyed
    # equi-joins, AQE picks broadcast at small SF where it measures
    # small.
    ca = corpus.select(F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va"))
    cb = corpus.select(F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb"))
    cos = cosine_fixed("__va", "__vb", dim)
    return (
        cand.join(ca, "__ida")
        .join(cb, "__idb")
        .where(cos >= threshold)
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


def srp_weight_sql(p_sql: str, d_sql: str) -> str:
    """±1 weight of plane p, dimension d (shared Spark/DuckDB text)."""
    return (
        f"(CASE WHEN (({p_sql} * 7919 + {d_sql} * 104729) % {SRP_MOD}) % 2 = 0 "
        "THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
    )


def srp_signature_sql(vec_sql: str, n_planes: int = 16) -> str:
    """Spark SQL expression: n_planes-bit SRP signature as a BIGINT.

    Works for any vector length (the fold runs over ``size(vec)``),
    but every higher-order-function lambda here evaluates on Spark's
    INTERPRETED expression path — n_planes * dim iterations per row
    outside whole-stage codegen. For a corpus with a fixed dimension,
    use :func:`srp_signature_unrolled_sql` (identical bits, ~30x).
    """
    proj = (
        f"aggregate(sequence(1, size({vec_sql})), CAST(0 AS DOUBLE), "
        f"(s, d) -> s + CAST(element_at({vec_sql}, d) AS DOUBLE) * "
        f"{srp_weight_sql('p', 'd')})"
    )
    return (
        f"aggregate(sequence(0, {n_planes - 1}), CAST(0 AS BIGINT), "
        f"(acc, p) -> acc * 2 + (CASE WHEN {proj} >= 0 THEN 1 ELSE 0 END))"
    )


def srp_signature_unrolled_sql(
    vec_sql: str, n_planes: int = 16, dim: int = 64
) -> str:
    """``srp_signature_sql`` with the plane/dim loops unrolled for a
    FIXED vector dimension — bit-identical output, whole-stage
    codegen instead of the interpreted lambda path.

    The ±1 plane weights are pure functions of (p, d), so they fold
    at build time into a plain add/subtract chain in the same
    d = 1..dim order as the aggregate fold (x * +-1.0 is IEEE-exact,
    a - b == a + (-b), so the projection is the same double
    bit-for-bit); the bit fold acc*2+bit over p = 0..n-1 becomes a
    sum of power-of-two literals. Precondition: every vector has
    exactly ``dim`` entries (the registry corpus contract — v09/v15/
    v17 pin generate_series(1, 64) in their oracles); a shorter
    vector fails loudly under ANSI element_at instead of mis-hashing.
    r13-opt receipt: 200k rows 31.5 -> 0.6 s, 0 mismatches.
    """
    plane_bits = []
    for p in range(n_planes):
        terms = []
        for d in range(1, dim + 1):
            w = ((p * 7919 + d * 104729) % SRP_MOD) % 2 == 0
            t = f"CAST(element_at({vec_sql}, {d}) AS DOUBLE)"
            terms.append(f"+ {t}" if w else f"- {t}")
        proj = f"(CAST(0 AS DOUBLE) {' '.join(terms)})"
        bit_val = 1 << (n_planes - 1 - p)
        plane_bits.append(
            f"(CASE WHEN {proj} >= 0 THEN CAST({bit_val} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
        )
    return "(" + " + ".join(plane_bits) + ")"


def srp_signature_duckdb_sql(vec_sql: str, n_planes: int = 16) -> str:
    """The same signature in DuckDB list-function dialect."""
    proj = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({vec_sql})), "
        f"d -> CAST({vec_sql}[d] AS DOUBLE) * {srp_weight_sql('p', 'd')})), "
        "(x, y) -> x + y)"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(0, {n_planes - 1}), "
        f"p -> CAST(CASE WHEN {proj} >= 0 THEN 1 ELSE 0 END AS BIGINT))), "
        "(a, b) -> a * 2 + b)"
    )


def mmr_rerank(cand: DataFrame, pair: DataFrame, k: int = 4) -> DataFrame:
    """Maximal-marginal-relevance re-rank of per-query candidate sets.

    cand: (query_id, cid, rel_u)  — relevance in integer micro-units
    pair: (query_id, ca, cb, sim_u) — candidate-candidate similarity

    Greedy MMR with lambda = 0.5 scaled to integers: the selection
    score is rel_u - max(sim_u to already-selected) (equivalent
    ranking to 0.5*rel - 0.5*maxsim), so every comparison is BIGINT
    and both engines agree exactly; ties break on candidate id.

    Scale shape: MMR runs AFTER retrieval, on candidate sets of
    bounded size N per query — each of the k unrolled steps is a join
    over queries x N rows (pair is queries x N^2), independent of
    corpus size. The loop is k DataFrame steps, not a driver loop
    over rows; nothing is collected.
    """
    # Materialize the two inputs once (each is consumed k-1 times);
    # localCheckpoint (lazy) over cache: shares one RDD across all
    # consumers, truncates lineage, and is GC-freed with the
    # DataFrame — no CacheManager entry leaks per call (the
    # ranking.with_global_rank pattern).
    cand = cand.localCheckpoint(eager=False)
    pair = pair.localCheckpoint(eager=False)
    w1 = Window.partitionBy("query_id").orderBy(F.desc("rel_u"), F.asc("cid"))
    sel = (
        cand.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            "cid",
            "rel_u",
            F.col("rel_u").alias("mmr_u"),
            F.lit(1).alias("position"),
        )
    )
    for t in range(2, k + 1):
        rem = cand.join(sel.select("query_id", "cid"), ["query_id", "cid"], "left_anti")
        p = pair.select(
            F.col("query_id").alias("p_qid"), "ca", "cb", "sim_u"
        )
        ms = (
            rem.join(
                p,
                (F.col("query_id") == F.col("p_qid")) & (F.col("cid") == F.col("ca")),
            )
            .drop("p_qid")
            .join(
                sel.select(F.col("query_id").alias("s_qid"), F.col("cid").alias("s_cid")),
                (F.col("query_id") == F.col("s_qid")) & (F.col("cb") == F.col("s_cid")),
            )
            .groupBy("query_id", "cid", "rel_u")
            .agg(F.max("sim_u").alias("maxsim"))
        )
        wt = Window.partitionBy("query_id").orderBy(
            F.desc(F.col("rel_u") - F.col("maxsim")), F.asc("cid")
        )
        pick = (
            ms.withColumn("rn", F.row_number().over(wt))
            .where(F.col("rn") == 1)
            .select(
                "query_id",
                "cid",
                "rel_u",
                (F.col("rel_u") - F.col("maxsim")).alias("mmr_u"),
                F.lit(t).alias("position"),
            )
        )
        # Checkpoint the growing selection: `sel` is consumed THREE
        # times next step (anti-join, selected-similarity join, the
        # union), so without materialization the plan tree replays
        # the entire selection history per step — O(k^2) joins, 52
        # SortMergeJoins in the static plan at k=4. Checkpointing
        # keeps each step's plan O(1) deep over the prior step's
        # blocks (measured 6.1s -> ~2s at sf0.1).
        sel = sel.unionAll(pick).localCheckpoint(eager=False)
    return sel
