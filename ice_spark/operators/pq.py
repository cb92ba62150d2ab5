"""Product quantization (PQ) for embedding compression + ANN.

The standard memory/IO reduction for vector search at corpus scale
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011): split each D-dim vector into M subvectors, k-means
each subspace into K codewords, store each vector as M small codes
(M=8, K=16 ⇒ 8 nibbles = 4 bytes instead of 256 bytes of float32 —
a 64x compression), and answer queries with asymmetric distance
computation (ADC): the exact query subvector against each assigned
codeword, summed across subspaces.

Determinism discipline (same as operators/ivf.py, which the v06
oracle replays):
- subspace codebooks seed from the K rows with smallest integer hash
  (vec_id * KNUTH mod 2^31) — the SAME seed rows for every subspace;
- one Lloyd iteration with integer-microunit centroid means (exact
  in any summation order);
- ADC distances quantize per-subspace to integer microunits and sum
  as BIGINTs, so ranking is bit-identical across engines and
  partitionings.

Scale shape: codebooks are M*K*dsub floats (tiny literals broadcast
with the plan); encoding and ADC are narrow per-row expressions —
no shuffle until the final per-query top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ice_spark.operators.ivf import train_centroids


def _sq_dist_expr(vec_sql: str, cent: list[float], offset: int = 0) -> str:
    """Left-to-right fold of squared L2 distance between a subvector
    (``vec_sql`` elements ``offset+1 .. offset+len(cent)``) and a
    literal codeword, UNROLLED: same doubles bit-for-bit as the old
    ``aggregate(zip_with(slice(...)))`` form (identical fold order and
    casts; x*x == (a-b)*(a-b) evaluated once per term either way) but
    whole-stage codegen instead of the interpreted HOF path, and no
    per-row slice/zip array allocations (guide §4.1). dsub is 8 and
    K 16 at the v11 call site — 128 unrolled folds of 8 terms per
    corpus row replaced ~1 interpreted expression-tree walk per
    element."""
    terms = " ".join(
        f"+ (CAST(element_at({vec_sql}, {offset + i + 1}) AS DOUBLE) - {float(c)!r})"
        f" * (CAST(element_at({vec_sql}, {offset + i + 1}) AS DOUBLE) - {float(c)!r})"
        for i, c in enumerate(cent)
    )
    return f"(CAST(0 AS DOUBLE) {terms})"


def train_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m_subspaces: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    iterations: int = 1,
) -> list[list[list[float]]]:
    """[m][k] -> codeword vector (dsub floats) per subspace."""
    dsub = dim // m_subspaces
    books: list[list[list[float]]] = []
    for m in range(m_subspaces):
        sub = corpus.select(
            F.col(id_col).alias("__pqid"),
            F.expr(f"slice({vec_col}, {m * dsub + 1}, {dsub})").alias("__sub"),
        )
        books.append(
            train_centroids(
                sub, "__sub", n_lists=k_codes, iterations=iterations, id_col="__pqid"
            )
        )
    return books


def encode(
    df: DataFrame,
    vec_col: str,
    books: list[list[list[float]]],
    dim: int = 64,
) -> DataFrame:
    """Add code_0..code_{M-1} columns: nearest codeword per subspace.
    Narrow expressions only — ties break toward the lower code, the
    same rule the SQL replay's ROW_NUMBER ordering applies."""
    m_subspaces = len(books)
    dsub = dim // m_subspaces
    out = df
    for m, book in enumerate(books):
        dists = "array(" + ", ".join(
            _sq_dist_expr(vec_col, c, offset=m * dsub) for c in book
        ) + ")"
        out = out.withColumn(
            f"code_{m}",
            F.expr(f"CAST(array_position({dists}, array_min({dists})) - 1 AS INT)"),
        )
    return out


def adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    books: list[list[list[float]]],
    k: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance top-k: per (query, corpus) pair, sum the
    per-subspace exact-query-to-codeword distances (integer
    microunits), rank per query. Returns (query_id, neighbor_id,
    adc_dist, rank)."""
    m_subspaces = len(books)
    dsub = dim // m_subspaces
    enc = encode(corpus, vec_col, books, dim=dim).select(
        F.col(id_col).alias("__nid"),
        *[F.col(f"code_{m}") for m in range(m_subspaces)],
    )
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qv")
    )
    # per-subspace distance: CASE over the K literal codewords keyed
    # by the stored code — the expression form of the ADC lookup table
    parts = []
    for m, book in enumerate(books):
        whens = " ".join(
            f"WHEN {kk} THEN CAST(ROUND(("
            f"{_sq_dist_expr('__qv', c, offset=m * dsub)}) * 1e6) AS BIGINT)"
            for kk, c in enumerate(book)
        )
        parts.append(f"(CASE code_{m} {whens} END)")
    adc_u = " + ".join(parts)
    # bounded query set broadcasts; the corpus streams through the
    # nested-loop join without a shuffle (v01's plan shape)
    pairs = enc.join(
        F.broadcast(q), F.col("__qid") != F.col("__nid")
    ).withColumn("__adc_u", F.expr(adc_u))
    w = Window.partitionBy("__qid").orderBy(F.col("__adc_u").asc(), F.col("__nid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__nid").alias("neighbor_id"),
            (F.col("__adc_u").cast("double") / 1e6).alias("adc_dist"),
            "rank",
        )
    )
