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
from ice_spark.operators.dedup import exact_dedup
from ice_spark.operators.sampling import hash_bucket, stratified_hash_sample


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
) -> tuple[DataFrame, DataFrame]:
    """Return (train, heldout) DataFrames after dedup + quality +
    repetition gates and optional per-language downsampling."""
    deduped = exact_dedup(docs, [text_col], id_col)
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
    catalog tables (zstd: the measured 2.8x-faster codec, PERF.md)."""
    from ice_spark.ingest.insert import append_dataframe

    train, heldout = clean_corpus(docs, **kwargs)
    out = {}
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
