"""Pure-Python media codecs: golden-byte fixtures, roundtrips, and
real parsing through the Spark multimodal operators."""

from __future__ import annotations

import struct
import zlib

from ice_spark.functions import media

# Golden fixture: a real 2x1 PNG (red, green pixels) built by an
# external reference implementation — byte-for-byte what libpng-based
# encoders accept. Validates our parser against known-good bytes, not
# against our own encoder.
GOLDEN_PNG_2x1 = (
    b"\x89PNG\r\n\x1a\n"
    + struct.pack(">I", 13) + b"IHDR" + struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    + struct.pack(">I", zlib.crc32(b"IHDR" + struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)))
    + (lambda d: struct.pack(">I", len(d)) + b"IDAT" + d
       + struct.pack(">I", zlib.crc32(b"IDAT" + d)))(
        zlib.compress(b"\x00\xff\x00\x00\x00\xff\x00")
    )
    + struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
)


def test_parse_golden_png():
    assert media.parse_png_header(GOLDEN_PNG_2x1) == (2, 1, "png")
    w, h, nch, px = media.decode_png(GOLDEN_PNG_2x1)
    assert (w, h, nch) == (2, 1, 3)
    assert bytes(px) == b"\xff\x00\x00\x00\xff\x00"  # red, green


def test_png_roundtrip_all_filters():
    """Encoder emits filter 0; decoder must handle 1-4 too. Re-filter
    the golden scanline data by hand per filter type and check the
    decode inverts it."""
    rows = [[(10, 20, 30), (40, 60, 80), (90, 10, 200)], [(5, 5, 5), (0, 0, 0), (255, 1, 2)]]
    blob = media.encode_png(rows, color_type=2)
    w, h, nch, px = media.decode_png(blob)
    assert (w, h, nch) == (3, 2, 3)
    flat = [c for row in rows for p in row for c in p]
    assert list(px) == flat

    # hand-build filtered variants of the same image
    stride = w * nch
    raw0 = bytes(px[:stride])
    raw1 = bytes(px[stride:])
    for ft in (1, 2, 3, 4):
        lines = []
        prev = bytes(stride)
        for raw in (raw0, raw1):
            line = bytearray()
            for x in range(stride):
                left = raw[x - nch] if x >= nch else 0
                up = prev[x]
                ul = prev[x - nch] if x >= nch else 0
                if ft == 1:
                    line.append((raw[x] - left) & 0xFF)
                elif ft == 2:
                    line.append((raw[x] - up) & 0xFF)
                elif ft == 3:
                    line.append((raw[x] - (left + up) // 2) & 0xFF)
                else:
                    line.append((raw[x] - media._paeth(left, up, ul)) & 0xFF)
            lines.append(bytes([ft]) + bytes(line))
            prev = raw
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        blob_f = (
            media.PNG_SIG
            + media._chunk(b"IHDR", ihdr)
            + media._chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + media._chunk(b"IEND", b"")
        )
        assert list(media.decode_png(blob_f)[3]) == flat, f"filter {ft}"


def test_png_resize_nearest():
    rows = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    blob = media.encode_png(rows, color_type=2)
    out = media.resize_nearest_png(blob, 4, 4)
    w, h, nch, px = media.decode_png(out)
    assert (w, h) == (4, 4)
    # corners keep the source colors
    assert tuple(px[0:3]) == (255, 0, 0)
    assert tuple(px[(4 * 3 + 3) * 3 : (4 * 3 + 3) * 3 + 3]) == (255, 255, 255)


def test_bmp_roundtrip_and_header():
    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    blob = media.encode_bmp(rows)
    assert media.parse_bmp_header(blob) == (2, 2, "bmp")
    w, h, nch, px = media.decode_bmp(blob)
    assert (w, h, nch) == (2, 2, 3)
    assert tuple(px[0:3]) == (1, 2, 3)  # top-left survives the bottom-up storage
    assert tuple(px[9:12]) == (10, 11, 12)


def test_jpeg_header_roundtrip():
    blob = media.synth_jpeg_header(123, 45)
    assert media.parse_jpeg_header(blob) == (123, 45, "jpeg")
    assert media.parse_image_header(blob) == (123, 45, "jpeg")


def test_gif_header():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert media.parse_gif_header(gif) == (320, 200, "gif")


def test_wav_roundtrip():
    blob = media.synth_wav(16000, 2, 1600, bits=16)
    meta = media.parse_wav_header(blob)
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 2
    assert meta["n_samples"] == 1600
    assert abs(meta["duration_sec"] - 0.1) < 1e-9


def test_parse_image_header_rejects_garbage():
    assert media.parse_image_header(b"not an image at all") is None
    assert media.parse_image_header(b"") is None


def test_decode_pipeline_parses_real_bytes(spark):
    """End-to-end through Spark: synthesized real containers come back
    with their true dimensions, not stub values."""
    from pyspark.sql import functions as F

    from ice_spark.operators.multimodal import decode_image_metadata, synthesize_media

    docs = spark.createDataFrame(
        [(0, "abc"), (1, "defgh"), (2, "ij")], ["doc_id", "text"]
    )
    out = decode_image_metadata(synthesize_media(docs), strict=True).select(
        "doc_id", "meta.width", "meta.height", "meta.format"
    )
    got = {r.doc_id: (r.width, r.height, r.format) for r in out.collect()}
    assert got == {
        0: (8, 8 + 3, "png"),
        1: (8 + 1, 8 + 5, "bmp"),
        2: (8 + 2, 8 + 2, "jpeg"),
    }


def test_resize_images_real_png_path(spark):
    from ice_spark.operators.multimodal import resize_images

    rows = [[(255, 0, 0)] * 6 for _ in range(4)]
    blob = media.encode_png(rows, color_type=2)
    df = spark.createDataFrame([(1, bytearray(blob))], ["id", "content"])
    out = resize_images(df, 3, 2).collect()[0]
    w, h, nch, px = media.decode_png(bytes(out.content))
    assert (w, h) == (3, 2)
    assert tuple(px[0:3]) == (255, 0, 0)
    assert (out.meta.width, out.meta.height, out.meta.format) == (3, 2, "png")


class TestVideoContainer:
    def test_roundtrip(self):
        from ice_spark.functions import media

        b = media.synth_video(15, 5, 4, [0, 128, 255, 7])
        v = media.parse_video(b)
        assert v == {
            "fps": 15,
            "width": 5,
            "height": 4,
            "n_frames": 4,
            "lumas": [0, 128, 255, 7],
        }

    def test_truncation_and_bad_magic_rejected(self):
        from ice_spark.functions import media

        b = media.synth_video(10, 4, 4, [1, 2, 3])
        assert media.parse_video(b[:-3]) is None
        assert media.parse_video(b + b"\x00") is None
        assert media.parse_video(b"AVI0" + b[4:]) is None
        assert media.parse_video(b"") is None

    def test_spark_demux_matches_synth(self, spark):
        from pyspark.sql import functions as F

        from ice_spark.operators.multimodal import (
            sample_video_frames,
            synthesize_video,
        )

        ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
        frames = sample_video_frames(synthesize_video(ids), stride=2)
        rows = frames.collect()
        assert rows, "demux produced no frames"
        for r in rows:
            i, fi = r["doc_id"], r["frame_idx"]
            assert r["fps"] == 10 + i % 20
            assert r["n_frames"] == 4 + i % 12
            assert fi % 2 == 0
            assert r["luma"] == (i * 7 + fi * 13) % 256
        # every video contributes ceil(n_frames/2) sampled frames
        per = {}
        for r in rows:
            per[r["doc_id"]] = per.get(r["doc_id"], 0) + 1
        assert all(per[i] == (4 + i % 12 + 1) // 2 for i in per)
        assert len(per) == 40
