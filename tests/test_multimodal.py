"""Multimodal plumbing tests (codecs stubbed, Spark shapes real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def media_df(spark, sf_dir):
    """Binary media column synthesized from documents (no image libs
    in this container; plumbing under test, not codecs)."""
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    return docs.select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )


def test_decode_metadata_schema_and_determinism(media_df):
    from ice_spark.operators.multimodal import decode_image_metadata

    out = decode_image_metadata(media_df)
    assert out.schema["meta"].dataType.simpleString() == (
        "struct<width:int,height:int,format:string>"
    )
    a = {r.doc_id: (r.meta.width, r.meta.height, r.meta.format) for r in out.collect()}
    b = {r.doc_id: (r.meta.width, r.meta.height, r.meta.format) for r in out.collect()}
    assert a == b  # deterministic stub
    assert all(64 <= v[0] < 256 for v in a.values())


def test_decode_strict_raises_on_unrecognized_bytes(media_df):
    """strict=True: real containers parse, but unparseable bytes must
    fail loudly at execution instead of returning stub metadata."""
    from ice_spark.operators.multimodal import _have_pil, decode_image_metadata

    if _have_pil():
        pytest.skip("PIL present")
    with pytest.raises(Exception, match="unrecognized image container"):
        decode_image_metadata(media_df, strict=True).collect()


def test_feature_extraction_feeds_similarity(spark, media_df):
    from ice_spark.operators.multimodal import extract_features
    from ice_spark.operators.similarity import brute_force_topk

    feats = extract_features(media_df, dim=8).select("doc_id", "features")
    row = feats.first()
    assert len(row.features) == 8
    # features plug into the ANN operator unchanged
    queries = feats.limit(2)
    out = brute_force_topk(
        corpus=feats,
        queries=queries,
        id_col="doc_id",
        vec_col="features",
        query_id_col="doc_id",
        query_vec_col="features",
        k=2,
    )
    rows = out.collect()
    assert {r.query_id for r in rows} == {r.doc_id for r in queries.collect()}
    assert all(r.rank <= 2 for r in rows)


def test_frame_sampling_shape(media_df):
    from ice_spark.operators.multimodal import sample_frames

    out = sample_frames(media_df, n_frames=4, id_cols=["doc_id"])
    assert out.columns == ["doc_id", "frame_idx", "frame"]
    counts = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    assert out.where(F.length("frame") == 0).count() == 0


def test_resize_stub_updates_meta(media_df):
    from ice_spark.operators.multimodal import decode_image_metadata, resize_images

    decoded = decode_image_metadata(media_df)
    resized = resize_images(decoded, 224, 224)
    metas = {(r.meta.width, r.meta.height) for r in resized.select("meta").collect()}
    assert metas == {(224, 224)}


def test_wav_pcm_roundtrip_and_rejects():
    from ice_spark.functions.media import (
        decode_wav_samples,
        synth_wav,
        synth_wav_pcm,
    )

    samples = [((5 * 31 + i * 17) % 2003) - 1001 for i in range(77)]
    assert decode_wav_samples(synth_wav_pcm(8000, samples)) == samples
    # stereo / non-16-bit containers are rejected, not misparsed
    assert decode_wav_samples(synth_wav(8000, channels=2, n_samples=10)) is None
    assert decode_wav_samples(b"RIFFxxxxWAVE") is None
    assert decode_wav_samples(b"not audio") is None
    # truncated data chunk: reject cleanly instead of struct.error
    assert decode_wav_samples(synth_wav_pcm(8000, [1, 2, 3])[:-2]) is None


def test_audio_window_energy_shapes(spark):
    from ice_spark.operators.multimodal import audio_window_energy, synthesize_audio

    docs = spark.range(3).selectExpr("id AS doc_id")
    wins = audio_window_energy(synthesize_audio(docs), window=32).collect()
    # doc 0: 64 samples -> 2 full windows; doc 1: 65 -> 3 (tail of 1)
    by_doc = {}
    for r in wins:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 2 and all(r.n_samples == 32 for r in by_doc[0])
    assert len(by_doc[1]) == 3 and by_doc[1][-1].n_samples == 1
    assert all(r.energy >= 0 for r in wins)
