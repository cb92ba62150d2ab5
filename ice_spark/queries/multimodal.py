"""Multimodal pipeline gate entries (rows-only: codecs are stubbed in
this environment; the Spark plumbing is the product under test)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.queries.registry import register
from ice_spark.tables import load_table


@register(
    "m01_media_pipeline",
    None,  # stubbed decode → no SQL oracle; shapes asserted in tests
    doc="Full multimodal pipeline: binary column → decode metadata → "
    "feature extraction (mapInPandas, Arrow-batched) → per-format "
    "stats. Decode is a deterministic stub (no image libs here); "
    "schema/batching/partitioning are the real design.",
)
def m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import decode_image_metadata, extract_features

    media = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "utf-8").alias("content"))
    )
    decoded = decode_image_metadata(media)
    feats = extract_features(decoded, dim=8)
    return (
        feats.select(
            "doc_id",
            F.col("meta.format").alias("format"),
            (F.col("meta.width") * F.col("meta.height")).alias("pixels"),
            F.aggregate(
                "features", F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")
            ).alias("feat_sq_norm"),
        )
        .groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("pixels").alias("avg_pixels"),
            F.round(F.avg("feat_sq_norm"), 4).alias("avg_feat_energy"),
        )
    )


@register(
    "m02_frame_sampling",
    None,
    doc="Video-style frame sampling: one row per sampled frame with "
    "bounded Arrow batches; frame bytes stay binary end-to-end.",
)
def m02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import sample_frames

    media = (
        load_table(spark, sf_dir, "documents")
        .limit(100)
        .select("doc_id", F.encode("text", "utf-8").alias("content"))
    )
    frames = sample_frames(media, n_frames=3, id_cols=["doc_id"])
    return frames.groupBy("frame_idx").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.avg(F.length("frame")).alias("avg_frame_bytes"),
    )
