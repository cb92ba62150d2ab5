"""Multimodal pipeline gate entries.

Both queries are now fully oracle-checked: m01 synthesizes REAL media
containers (valid PNG/BMP bytes, structurally-valid JPEG headers)
whose dimensions/colors are pure functions of (doc_id, text length),
runs the real pure-Python decode path (functions/media.py), and the
DuckDB oracle recomputes the same facts analytically — so a parsing
bug on either side breaks the hash match. m02's frame-slicing
arithmetic is replayed exactly in SQL.

Float discipline: per-image feature energy is rounded to integer
micro-units before the cross-row sum (same idiom as v07), so both
engines aggregate exact integers and only divide at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.queries.registry import register
from ice_spark.tables import load_table

# Feature energy of a solid-color (r,g,b) image: features are the
# per-channel means /255 stored as float32, energy = sum of squares in
# double. The oracle replays the float32 truncation explicitly.
_SQL_ENERGY = (
    "CAST(CAST(r / 255.0 AS REAL) AS DOUBLE) * CAST(CAST(r / 255.0 AS REAL) AS DOUBLE)"
    " + CAST(CAST(g / 255.0 AS REAL) AS DOUBLE) * CAST(CAST(g / 255.0 AS REAL) AS DOUBLE)"
    " + CAST(CAST(b / 255.0 AS REAL) AS DOUBLE) * CAST(CAST(b / 255.0 AS REAL) AS DOUBLE)"
)


@register(
    "m01_media_pipeline",
    f"""
    WITH m AS (
      SELECT doc_id,
             doc_id % 3 AS kind,
             8 + doc_id % 24 AS w,
             8 + octet_length(encode(text)) % 24 AS h,
             doc_id % 256 AS r,
             octet_length(encode(text)) % 256 AS g,
             (doc_id + octet_length(encode(text))) % 256 AS b
      FROM documents
    ),
    per_doc AS (
      SELECT CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'jpeg' END AS format,
             w * CAST(h AS BIGINT) AS pixels,
             CASE WHEN kind = 2 THEN CAST(0 AS BIGINT)
                  ELSE CAST(ROUND(({_SQL_ENERGY}) * 1e6) AS BIGINT) END AS energy_u
      FROM m
    )
    SELECT format,
           COUNT(*) AS n,
           AVG(pixels) AS avg_pixels,
           ROUND(CAST(SUM(energy_u) AS DOUBLE) / 1e6 / COUNT(*), 4) AS avg_feat_energy
    FROM per_doc
    GROUP BY format
    """,
    doc="Full multimodal pipeline over REAL container bytes: "
    "synthesize valid PNG/BMP/JPEG per document (dims + solid color "
    "derived from doc_id/text length) → parse actual headers back out "
    "(functions/media.py pure-Python codecs) → pixel-stat features → "
    "per-format stats. The oracle recomputes dims/colors analytically; "
    "a decode bug on either side breaks the hash match. All stages "
    "Arrow-batched mapInPandas.",
)
def m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import (
        decode_image_metadata,
        extract_features,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = synthesize_media(docs, id_col="doc_id", text_col="text")
    decoded = decode_image_metadata(media, strict=True)
    feats = extract_features(decoded, dim=8)
    per_doc = feats.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        (F.col("meta.width") * F.col("meta.height").cast("long")).alias("pixels"),
        F.round(
            F.aggregate(
                "features", F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")
            )
            * 1e6
        )
        .cast("long")
        .alias("energy_u"),
    )
    return per_doc.groupBy("format").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("pixels").alias("avg_pixels"),
        F.round(F.sum("energy_u").cast("double") / 1e6 / F.count(F.lit(1)), 4).alias(
            "avg_feat_energy"
        ),
    )


@register(
    "m02_frame_sampling",
    """
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS len,
             greatest(1, octet_length(encode(text)) // 3) AS step
      FROM documents WHERE doc_id < 100
    ),
    f AS (
      SELECT doc_id, frame_idx,
             CASE WHEN len - frame_idx * step <= 0 THEN 1
                  ELSE least(step, len - frame_idx * step) END AS flen
      FROM d CROSS JOIN (SELECT CAST(UNNEST([0, 1, 2]) AS INTEGER) AS frame_idx)
    )
    SELECT frame_idx, COUNT(*) AS n_frames, AVG(flen) AS avg_frame_bytes
    FROM f GROUP BY frame_idx
    """,
    doc="Video-style frame sampling: one row per sampled frame with "
    "bounded Arrow batches; frame bytes stay binary end-to-end. The "
    "oracle replays the byte-slicing arithmetic (step = len//3, tail "
    "clamp, empty→1-byte sentinel) exactly.",
)
def m02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import sample_frames

    media = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", F.encode("text", "utf-8").alias("content"))
    )
    frames = sample_frames(media, n_frames=3, id_cols=["doc_id"])
    return frames.groupBy("frame_idx").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.avg(F.length("frame")).alias("avg_frame_bytes"),
    )


@register(
    "m03_patch_grid",
    """
    WITH m AS (
      SELECT doc_id,
             doc_id % 3 AS kind,
             8 + doc_id % 24 AS w,
             8 + octet_length(encode(text)) % 24 AS h
      FROM documents
    ),
    p AS (
      SELECT CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'jpeg' END AS format,
             w, h, t.px AS px, t.py AS py,
             LEAST(8, w - t.px * 8) AS pw,
             LEAST(8, h - t.py * 8) AS ph
      FROM m
      CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS px) gx
      CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS py) gy,
      LATERAL (SELECT gx.px AS px, gy.py AS py) t
      WHERE t.px < CAST(CEIL(w / 8.0) AS INTEGER)
        AND t.py < CAST(CEIL(h / 8.0) AS INTEGER)
    )
    SELECT format,
           COUNT(*) AS n_patches,
           COUNT(*) FILTER (WHERE pw < 8 OR ph < 8) AS n_edge_patches,
           CAST(SUM(pw * CAST(ph AS BIGINT)) AS BIGINT) AS total_patch_area
    FROM p
    GROUP BY format
    """,
    doc="ViT-style patch tiling over REAL decoded image headers: "
    "synthesize container bytes, decode width/height back out "
    "(functions/media.py), tile into 8x8 patches with clipped edge "
    "tiles (operators/multimodal.patch_grid — sequence+explode, no "
    "Python per row). The oracle replays the dimension arithmetic and "
    "the full tiling grid; a header-parse or tiling bug on either "
    "side breaks the hash.",
)
def m03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import (
        decode_image_metadata,
        patch_grid,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    media = synthesize_media(docs, id_col="doc_id", text_col="text")
    decoded = decode_image_metadata(media, strict=True)
    tiled = patch_grid(decoded, patch=8)
    return tiled.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n_patches"),
        F.sum(
            F.when((F.col("patch_w") < 8) | (F.col("patch_h") < 8), 1).otherwise(0)
        ).alias("n_edge_patches"),
        F.sum(F.col("patch_w") * F.col("patch_h").cast("long"))
        .cast("long")
        .alias("total_patch_area"),
    )


@register(
    "m04_audio_window_energy",
    """
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 128 AS n
      FROM documents WHERE doc_id < 200
    ),
    s AS (
      SELECT doc_id, i, ((doc_id * 31 + i * 17) % 2003) - 1001 AS v
      FROM d, LATERAL (SELECT UNNEST(generate_series(0, n - 1)) AS i)
    ),
    w AS (
      SELECT doc_id, i // 32 AS window_idx,
             CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
      FROM s GROUP BY doc_id, i // 32
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(energy) AS BIGINT) AS total_energy,
           MAX(energy) AS peak_window_energy
    FROM w GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Audio feature extraction over REAL RIFF/WAVE bytes: "
    "synthesize 16-bit PCM per document (waveform a pure function of "
    "doc_id), decode the actual container back (functions/media."
    "decode_wav_samples), window into 32-sample frames inside "
    "mapInPandas, and aggregate integer sum-of-squares energies. The "
    "oracle recomputes every sample analytically — a byte-layout bug "
    "anywhere in the WAV codec breaks the hash. Decode is map-only; "
    "the single shuffle is the per-document aggregation.",
)
def m04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import audio_window_energy, synthesize_audio

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id")
    )
    audio = synthesize_audio(docs, id_col="doc_id")
    wins = audio_window_energy(audio, id_col="doc_id", window=32)
    return (
        wins.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("energy").alias("total_energy"),
            F.max("energy").alias("peak_window_energy"),
        )
        .orderBy("doc_id")
    )


@register(
    "m05_perceptual_hash_groups",
    """
    WITH d AS (
      SELECT doc_id, 13 * (doc_id % 25) AS base
      FROM documents WHERE doc_id < 400
    ),
    cells AS (
      SELECT doc_id, base, cy.g AS cy, cx.g AS cx,
             (  (base + 8 * (2 * cx.g)     + 3 * (2 * cy.g))     % 256
              + (base + 8 * (2 * cx.g + 1) + 3 * (2 * cy.g))     % 256
              + (base + 8 * (2 * cx.g)     + 3 * (2 * cy.g + 1)) % 256
              + (base + 8 * (2 * cx.g + 1) + 3 * (2 * cy.g + 1)) % 256
             ) AS cs
      FROM d, generate_series(0, 7) cy(g), generate_series(0, 7) cx(g)
    ),
    tot AS (SELECT doc_id, SUM(cs) AS total FROM cells GROUP BY doc_id),
    bands AS (
      SELECT c.doc_id, (8 * cy + cx) // 16 AS band_i,
             CAST(SUM(CASE WHEN 64 * cs > t.total
                           THEN CAST(1 AS BIGINT) << ((8 * cy + cx) % 16)
                           ELSE 0 END) AS BIGINT) AS band
      FROM cells c JOIN tot t USING (doc_id)
      GROUP BY c.doc_id, band_i
    ),
    hashes AS (
      SELECT doc_id,
             printf('%04x%04x%04x%04x',
                    MAX(CASE WHEN band_i = 3 THEN band END),
                    MAX(CASE WHEN band_i = 2 THEN band END),
                    MAX(CASE WHEN band_i = 1 THEN band END),
                    MAX(CASE WHEN band_i = 0 THEN band END)) AS hash_hex
      FROM bands GROUP BY doc_id
    )
    SELECT hash_hex,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(COUNT(DISTINCT doc_id % 25) AS BIGINT) AS n_classes
    FROM hashes
    GROUP BY hash_hex
    ORDER BY hash_hex
    """,
    doc="Perceptual-hash (aHash) image dedup over REAL PNG bytes: "
    "synthesize a 16x16 pattern image per doc (pixels a pure function "
    "of doc_id, so the oracle recomputes them analytically), decode "
    "the actual container through the pure-Python PNG codec, and "
    "compute the 8x8 average hash with INTEGER comparisons "
    "(64*cell_sum > total_sum — no float mean, brightness-invariant "
    "by construction). Images group by hash; n_classes reports how "
    "many pattern classes share a bucket — classes whose pixels "
    "never wrap mod 256 differ only in brightness and so collide "
    "INTENTIONALLY (that invariance is aHash's point), while wrapped "
    "patterns split into distinct hashes. The hash is "
    "emitted as four 16-bit bands — the same banding the SimHash "
    "pipeline (d05) uses for Hamming-tolerant candidate joins at "
    "corpus scale. A decode bug on either side breaks the hash match.",
)
def m05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import perceptual_ahash, synthesize_pattern_png

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400).select("doc_id")
    media = synthesize_pattern_png(docs)
    hashed = perceptual_ahash(media)
    return (
        hashed.groupBy("hash_hex")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("min_doc_id"),
            F.countDistinct(F.col("doc_id") % 25).alias("n_classes"),
        )
        .orderBy("hash_hex")
    )


@register(
    "m06_audio_silence_segments",
    """
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 128 AS n
      FROM documents WHERE doc_id < 200
    ),
    s AS (
      SELECT doc_id, i,
             CASE WHEN (i // 32 + doc_id) % 3 = 0 THEN 0
                  ELSE ((doc_id * 31 + i * 17) % 2003) - 1001 END AS v
      FROM d, LATERAL (SELECT UNNEST(generate_series(0, n - 1)) AS i)
    ),
    w AS (
      SELECT doc_id, i // 32 AS window_idx,
             CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
      FROM s GROUP BY doc_id, i // 32
    ),
    act AS (
      SELECT doc_id, window_idx,
             window_idx - ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY window_idx) AS grp
      FROM w WHERE energy > 0
    ),
    seg AS (
      SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS seg_len
      FROM act GROUP BY doc_id, grp
    ),
    tot AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(COUNT(*) FILTER (WHERE energy = 0) AS BIGINT) AS n_silent
      FROM w GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_windows, t.n_silent,
           CAST(COALESCE(COUNT(seg.grp), 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(MAX(seg.seg_len), 0) AS BIGINT) AS longest_segment
    FROM tot t LEFT JOIN seg ON seg.doc_id = t.doc_id
    GROUP BY t.doc_id, t.n_windows, t.n_silent
    ORDER BY t.doc_id
    """,
    doc="Audio silence segmentation over REAL WAV bytes: synthesized "
    "speech-shaped PCM (every third 32-sample window gated to "
    "silence, offset per doc) is decoded back through the pure-Python "
    "RIFF parser, windowed energies thresholded, and active windows "
    "grouped into segments with the gaps-and-islands pattern (e18's "
    "idiom applied to media). Per-doc segment counts and longest "
    "voiced run — the VAD-style pre-processing an audio training "
    "pipeline runs before transcription. Decode is map-only; windows "
    "are bounded per doc; the islands window runs on the tiny "
    "per-doc window relation.",
)
def m06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ice_spark.operators.multimodal import audio_window_energy, synthesize_audio

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id")
    )
    audio = synthesize_audio(docs, id_col="doc_id", gate_every=3)
    wins = audio_window_energy(audio, id_col="doc_id", window=32)
    act = wins.where(F.col("energy") > 0).select(
        "doc_id",
        "window_idx",
        (
            F.col("window_idx")
            - F.row_number().over(W.partitionBy("doc_id").orderBy("window_idx"))
        ).alias("grp"),
    )
    seg = act.groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("seg_len"))
    tot = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("energy") == 0, 1).otherwise(0)).cast("long").alias("n_silent"),
    )
    segs = seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("seg_len").alias("longest_segment"),
    )
    return (
        tot.join(segs, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            "n_silent",
            F.coalesce(F.col("n_segments"), F.lit(0)).cast("long").alias("n_segments"),
            F.coalesce(F.col("longest_segment"), F.lit(0))
            .cast("long")
            .alias("longest_segment"),
        )
        .orderBy("doc_id")
    )


@register(
    "m07_video_frame_sampling",
    """
    WITH d AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200),
    v AS (
      SELECT id,
             CAST(10 + id % 20 AS BIGINT) AS fps,
             CAST(4 + id % 12 AS BIGINT) AS n_frames
      FROM d
    ),
    f AS (
      SELECT id, fps, n_frames,
             CAST(UNNEST(generate_series(0, n_frames - 1)) AS BIGINT) AS fi
      FROM v
    ),
    s AS (
      SELECT id, fps, n_frames, fi, (id * 7 + fi * 13) % 256 AS luma
      FROM f WHERE fi % 2 = 0
    )
    SELECT fps,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS n_videos,
           CAST(SUM(CASE WHEN fi = 0 THEN n_frames ELSE 0 END) AS BIGINT)
             AS total_frames,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(luma) AS BIGINT) AS sum_sampled_luma,
           CAST(SUM(luma) * 10000 // COUNT(*) AS BIGINT) AS mean_luma_e4
    FROM s
    GROUP BY fps
    ORDER BY fps
    """,
    doc="Video frame sampling over REAL container bytes: per doc a "
    "VID0 container (magic + fps/geometry header + length-prefixed "
    "frame payloads) is synthesized from pure functions of doc_id, "
    "then DEMUXED back — the parser walks actual frame offsets — and "
    "every 2nd frame is sampled (operators/multimodal."
    "sample_video_frames, Arrow-batched mapInPandas, the training-"
    "data frame-sampling shape). Per fps bucket: videos, header "
    "frame counts, sampled-frame count and exact integer luma stats. "
    "The oracle recomputes everything analytically, so a header-walk "
    "or stride bug on the Spark side breaks the hash. Scale: "
    "synth+demux are map-only; the only shuffle is the final "
    "fps-keyed rollup.",
)
def m07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ice_spark.operators.multimodal import sample_video_frames, synthesize_video

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("doc_id")
    )
    media = synthesize_video(docs, id_col="doc_id")
    frames = sample_video_frames(media, id_col="doc_id", stride=2)
    return (
        frames.groupBy("fps")
        .agg(
            F.countDistinct("doc_id").alias("n_videos"),
            F.sum(F.when(F.col("frame_idx") == 0, F.col("n_frames")).otherwise(0))
            .cast("long")
            .alias("total_frames"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("luma").cast("long").alias("sum_sampled_luma"),
            F.expr("CAST(SUM(luma) * 10000 div COUNT(*) AS BIGINT)").alias(
                "mean_luma_e4"
            ),
        )
        .orderBy("fps")
    )
