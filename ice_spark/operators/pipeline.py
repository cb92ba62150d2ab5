"""End-to-end training-corpus build: the composition users actually
run at 100 TB, materialized into catalog tables.

    raw documents
      → exact dedup           (operators/dedup.exact_dedup)
      → quality gate          (functions/text: tokens + stopword ratio)
      → repetition gate       (dup-bigram fraction, t09 thresholds)
      → stratified downsample (operators/sampling, optional)
      → deterministic train/heldout split (hash buckets)
      → two catalog tables with snapshot lineage

Every stage is a narrow projection or one aggregation — the composed
job is a single Spark plan until the two writes. Counts are collected
once per stage boundary from the written tables' manifests (no extra
actions over the data)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ice_spark.functions import text as T
from ice_spark.operators.dedup import (
    DEFAULT_MAX_POSTING,
    dropped_posting_mass,
    exact_dedup,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
)
from ice_spark.operators.sampling import hash_bucket, stratified_hash_sample

# Routing threshold (basis points of posting rows the cap drops):
# under 1% the capped finder's recall loss is negligible and its
# hard O(cap²)-per-bucket bound is the cheaper plan; at or over 1%
# the corpus is dup-heavy enough that the cap visibly eats recall
# (the measured sf5 regime: 49% dropped) and the full-recall banded
# LSH path is the correct strategy. Same 100 bp line p04's health
# card draws.
ROUTE_THRESHOLD_BP = 100
ROUTE_CAPPED = "capped-shingle"
ROUTE_LSH = "minhash-lsh"


def dedup_route_audit(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    caps: list[int] | None = None,
    threshold_bp: int = ROUTE_THRESHOLD_BP,
) -> DataFrame:
    """Per-cap routing decision over the shingle posting index: d17's
    dropped-posting-mass audit (the same vocabulary-keyed shuffle the
    capped finder itself pays) extended with `dropped_bp` and the
    chosen `route` — '{capped-shingle,minhash-lsh}'. O(len(caps))
    output rows at any corpus size."""
    caps = caps or [DEFAULT_MAX_POSTING]
    ex = docs.select(
        F.col(id_col), F.explode(T.shingle_hashes(text_col)).alias("__s")
    )
    audit = dropped_posting_mass(ex, ["__s"], caps, "shingle")
    dropped_bp = F.coalesce(
        F.expr(
            "CAST(dropped_posting_rows * 10000 "
            "div nullif(total_posting_rows, 0) AS BIGINT)"
        ),
        F.lit(0).cast("long"),
    )
    return audit.withColumn("dropped_bp", dropped_bp).withColumn(
        "route",
        F.when(F.col("dropped_bp") >= threshold_bp, F.lit(ROUTE_LSH)).otherwise(
            F.lit(ROUTE_CAPPED)
        ),
    )


def near_dedup(
    docs: DataFrame,
    strategy: str = "auto",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_posting: int = DEFAULT_MAX_POSTING,
    threshold_bp: int = ROUTE_THRESHOLD_BP,
) -> tuple[DataFrame, dict]:
    """Remove near-duplicate documents (Jaccard >= threshold), keeping
    the smallest id of each pair — a doc is dropped iff it pairs with
    a smaller-id doc (deterministic, engine-portable keep rule).

    strategy: 'capped-shingle' (exact containment pairs over a capped
    posting index — cheap, hard per-bucket bound, bounded recall
    loss), 'minhash-lsh' (banded LSH + exact verify — full recall at
    the 0.8 operating point), or 'auto': run dedup_route_audit at
    `max_posting` and let the measured dropped posting share pick the
    path, so a dup-heavy corpus switches to the full-recall finder
    automatically instead of silently shipping a zero-recall pair
    list (the d17/p04 loop, closed). The auto collect is ONE audit
    row — bounded at any corpus size.

    Returns (deduped_docs, route_info) where route_info records the
    strategy actually run and, for 'auto', the audited dropped_bp.
    """
    info: dict = {"strategy": strategy}
    if strategy == "auto":
        rows = dedup_route_audit(
            docs,
            id_col=id_col,
            text_col=text_col,
            caps=[max_posting],
            threshold_bp=threshold_bp,
        ).collect()
        if not rows:
            # dropped_posting_mass yields ZERO rows on an empty posting
            # index (empty corpus): nothing to dedup, so no cap can
            # bind — take the cheap capped route (a no-op) instead of
            # crashing the public operator / CLI path with IndexError.
            strategy = ROUTE_CAPPED
            info = {
                "strategy": strategy,
                "routed": True,
                "dropped_bp": 0,
                "cap": max_posting,
                "threshold_bp": threshold_bp,
                "empty_audit": True,
            }
        else:
            row = rows[0]
            strategy = row["route"]
            info = {
                "strategy": strategy,
                "routed": True,
                "dropped_bp": row["dropped_bp"],
                "cap": row["cap"],
                "threshold_bp": threshold_bp,
            }
    if strategy == ROUTE_CAPPED:
        pairs = shingle_jaccard_pairs(
            docs, id_col, text_col, threshold=threshold, max_posting=max_posting
        )
    elif strategy == ROUTE_LSH:
        pairs = minhash_lsh_pairs(
            docs, id_col=id_col, text_col=text_col, threshold=threshold
        )
    else:
        raise ValueError(f"unknown near-dedup strategy {strategy!r}")
    drop = pairs.select(F.col("doc_b").alias(id_col))
    return docs.join(drop, id_col, "left_anti"), info


def clean_corpus(
    docs: DataFrame,
    *,
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.02,
    max_dup_bigram: float = 0.1,
    strata_fractions: dict[str, float] | None = None,
    heldout_fraction: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    near_dedup_strategy: str | None = None,
    route_out: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (train, heldout) DataFrames after dedup + quality +
    repetition gates and optional per-language downsampling.

    near_dedup_strategy: None (exact dedup only, the historical
    pipeline), 'capped-shingle', 'minhash-lsh', or 'auto' — 'auto'
    audits the shingle posting index and picks the capped finder vs
    full-recall banded LSH by measured dropped posting mass (the
    p04 recommendation, consumed instead of printed). The decision
    actually taken is written into `route_out` when provided."""
    deduped = exact_dedup(docs, [text_col], id_col)
    if near_dedup_strategy is not None:
        deduped, info = near_dedup(
            deduped, near_dedup_strategy, id_col=id_col, text_col=text_col
        )
        if route_out is not None:
            route_out.update(info)
    gated = (
        deduped.withColumn("__n_tok", T.token_count(text_col))
        .withColumn("__sw", T.stopword_ratio(text_col))
        .withColumn(
            "__dup2",
            F.expr(
                f"CASE WHEN size({T.tokens_sql(text_col)}) >= 2 THEN "
                f"1 - CAST(size(array_distinct(transform(sequence(1, "
                f"size({T.tokens_sql(text_col)}) - 1), i -> "
                f"concat(element_at({T.tokens_sql(text_col)}, i), ' ', "
                f"element_at({T.tokens_sql(text_col)}, i + 1))))) AS DOUBLE) "
                f"/ (size({T.tokens_sql(text_col)}) - 1) ELSE 0D END"
            ),
        )
        .where(
            (F.col("__n_tok") >= min_tokens)
            & (F.col("__sw") >= min_stopword_ratio)
            & (F.col("__dup2") <= max_dup_bigram)
        )
        .drop("__n_tok", "__sw", "__dup2")
    )
    if strata_fractions:
        gated = stratified_hash_sample(gated, id_col, lang_col, strata_fractions)
    cut = int(heldout_fraction * 10_000)
    b = hash_bucket(F.col(id_col))
    return gated.where(b >= cut), gated.where(b < cut)


def build_corpus(
    catalog,
    docs: DataFrame,
    namespace: str,
    *,
    compression: str = "zstd",
    **kwargs,
) -> dict:
    """Materialize the cleaned corpus as `<ns>.train` / `<ns>.heldout`
    catalog tables (zstd: the measured 2.8x-faster codec, PERF.md).
    With near_dedup_strategy='auto' the dedup route taken (and the
    audited dropped_bp that drove it) is recorded under
    out['dedup_route']."""
    from ice_spark.ingest.insert import append_dataframe

    route: dict = {}
    train, heldout = clean_corpus(docs, route_out=route, **kwargs)
    out = {}
    if route:
        out["dedup_route"] = route
    for name, df in (("train", train), ("heldout", heldout)):
        ident = f"{namespace}.{name}"
        t = catalog.create_table(ident, schema=docs.schema, exist_ok=True)
        append_dataframe(t, df, compression=compression)
        snap = t.snapshot()
        out[name] = {
            "table": ident,
            "rows": snap["summary"]["total-records"],
            "snapshot_id": snap["snapshot_id"],
        }
    return out
