"""Multimodal (image/audio/video) column operators.

Design for 100 TB training-data pipelines: media travels as opaque
`binary` columns with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages so bytes never round-trip through Python
row-at-a-time pickling.

Decode is REAL for PNG/BMP/JPEG/GIF/WAV containers via the pure-Python
codecs in `ice_spark.functions.media` (PNG is a full zlib-backed
pixel codec; JPEG/GIF are header-level). PIL is used instead when
importable; unrecognized bytes fall back to a clearly-marked
deterministic stub (or raise when `strict=True`). Heavy formats
(video frames, ffmpeg) remain stubbed — the Spark-side plumbing
(schemas, batch iteration, partition sizing, UDF signatures) is
identical either way.

Scale notes:
- mapInPandas streams Arrow batches; `spark.sql.execution.arrow.
  maxRecordsPerBatch` bounds memory per batch (set in session.py).
- media rows are large → repartition by size before heavy stages
  (`target_rows_per_partition`), not by row count.
- feature vectors come back as array<float> ready for
  operators.similarity (ANN / near-dup).
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

_FEATURE_DIM = 16


def _stub_decode_meta(data: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: pretends to parse a header.
    STUB — replace with PIL.Image.open when available."""
    h = hashlib.sha256(data).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    fmt = ["jpeg", "png", "webp"][h[2] % 3]
    return w, ht, fmt


def _stub_features(data: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic fake embedding from content bytes.
    STUB — replace with a real vision encoder."""
    out = []
    seed = hashlib.sha256(data).digest()
    for i in range(dim):
        chunk = hashlib.sha256(seed + _struct.pack("<I", i)).digest()[:4]
        out.append(_struct.unpack("<I", chunk)[0] / 2**32 - 0.5)
    return out


def _have_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_metadata(
    df: DataFrame, binary_col: str = "content", strict: bool = False
) -> DataFrame:
    """binary → + meta struct(width,height,format). Arrow-batched.

    Real header parsing (PNG/BMP/JPEG/GIF magic + dimensions) via
    `functions.media`; PIL when available; deterministic stub only
    for unrecognized bytes (raises instead when strict=True)."""
    use_pil = _have_pil()

    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", IMAGE_META)])

    def run(batches: Iterator) -> Iterator:
        from ice_spark.functions.media import parse_image_header

        for pdf in batches:
            metas = []
            for data in pdf[binary_col]:
                b = bytes(data) if data is not None else b""
                parsed = parse_image_header(b)
                if parsed is not None:
                    w, h, f = parsed
                elif use_pil:  # pragma: no cover - not in this container
                    import io

                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(b))
                    w, h, f = img.width, img.height, img.format.lower()
                elif strict:
                    raise NotImplementedError(
                        "unrecognized image container and no PIL available"
                    )
                else:
                    w, h, f = _stub_decode_meta(b)
                metas.append({"width": w, "height": h, "format": f})
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _pixel_features(data: bytes, dim: int) -> list[float] | None:
    """Real features from decodable pixels: per-channel mean in [0,1],
    zero-padded to `dim`. Header-only containers (JPEG without scan
    data decoded here) get all-zero features; unrecognized bytes get
    None (caller falls back to the stub)."""
    from ice_spark.functions import media

    try:
        if data.startswith(media.PNG_SIG):
            w, h, nch, px = media.decode_png(data)
        elif data[:2] == b"BM":
            w, h, nch, px = media.decode_bmp(data)
        elif media.parse_jpeg_header(data) is not None:
            return [0.0] * dim
        else:
            return None
    except Exception:
        return None
    if not px:
        return [0.0] * dim
    sums = [0] * nch
    for i, v in enumerate(px):
        sums[i % nch] += v
    n = len(px) // nch
    out = [s / n / 255.0 for s in sums]
    return (out + [0.0] * dim)[:dim]


def extract_features(
    df: DataFrame,
    binary_col: str = "content",
    feature_col: str = "features",
    dim: int = _FEATURE_DIM,
) -> DataFrame:
    """binary → + array<float> feature vector (Arrow-batched).
    Decodable images get real pixel-stat features (per-channel means);
    everything else gets the deterministic content-hash stub. Output
    plugs directly into operators.similarity ANN."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(feature_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            feats = []
            for d in pdf[binary_col]:
                b = bytes(d) if d is not None else b""
                feats.append(_pixel_features(b, dim) or _stub_features(b, dim))
            pdf[feature_col] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """binary → binary resized + refreshed meta.

    PNG gets a REAL resize (decode → nearest-neighbor → re-encode via
    `functions.media`, pure Python + zlib). Other formats pass bytes
    through with updated meta (swap in PIL/libvips here for a full
    codec matrix; strict=True raises for them instead)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "meta"]
        + [T.StructField("meta", IMAGE_META)]
    )

    def run(batches: Iterator) -> Iterator:
        from ice_spark.functions.media import PNG_SIG, parse_image_header, resize_nearest_png

        for pdf in batches:
            pdf = pdf.copy()
            metas, outs = [], []
            for data in pdf[binary_col]:
                b = bytes(data) if data is not None else b""
                if b.startswith(PNG_SIG):
                    b = resize_nearest_png(b, width, height)
                    fmt = "png"
                else:
                    if strict:
                        raise NotImplementedError(
                            "real resize implemented for PNG only in this environment"
                        )
                    parsed = parse_image_header(b)
                    fmt = parsed[2] if parsed else "unknown"
                outs.append(b)
                metas.append({"width": width, "height": height, "format": fmt})
            pdf[binary_col] = outs
            pdf["meta"] = metas
            yield pdf[[f.name for f in out_schema.fields]]

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    n_frames: int,
    binary_col: str = "content",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """video binary → one row per sampled frame (frame_idx, frame
    bytes). STUB frame extraction (byte-range slices); real shape:
    explode-by-generator inside mapInPandas so a 1 GB video never
    materializes as n_frames copies in one row."""
    id_cols = id_cols or [c for c in df.columns if c != binary_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[binary_col]) if r[binary_col] is not None else b""
                step = max(1, len(data) // max(n_frames, 1))
                for i in range(n_frames):
                    frame = data[i * step : (i + 1) * step] or b"\x00"
                    rows.append(
                        {**{c: r[c] for c in id_cols}, "frame_idx": i, "frame": frame}
                    )
            yield pd.DataFrame(rows, columns=[*id_cols, "frame_idx", "frame"])

    return df.mapInPandas(run, schema=out_schema)


def synthesize_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", binary_col: str = "content"
) -> DataFrame:
    """Deterministically materialize REAL media containers from a text
    table: per row a valid PNG / BMP / JPEG-header whose dimensions
    and solid fill color are pure functions of (id, text length).

    This is the fixture generator that lets the decode pipeline be
    verified end-to-end against a SQL oracle (the oracle recomputes
    width/height/color analytically; the pipeline must parse them back
    out of the actual bytes). Runs as mapInPandas like every other
    media stage.
    """
    out_schema = T.StructType(
        [df.schema[id_col]]
        + [T.StructField(binary_col, T.BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ice_spark.functions import media

        for pdf in batches:
            ids, blobs = [], []
            for _, r in pdf.iterrows():
                i = int(r[id_col])
                ln = len(str(r[text_col]).encode("utf-8"))
                w, h = 8 + i % 24, 8 + ln % 24
                color = (i % 256, ln % 256, (i + ln) % 256)
                kind = i % 3
                if kind == 0:
                    blob = media.encode_png([[color] * w for _ in range(h)], color_type=2)
                elif kind == 1:
                    blob = media.encode_bmp([[color] * w for _ in range(h)])
                else:
                    blob = media.synth_jpeg_header(w, h)
                ids.append(i)
                blobs.append(blob)
            yield pd.DataFrame({id_col: ids, binary_col: blobs})

    return df.mapInPandas(run, schema=out_schema)


def repartition_for_media(df: DataFrame, size_col: str, target_bytes: int = 256 * 1024 * 1024):
    """Pre-stage partitioning by cumulative media size, not row count:
    keeps Arrow batches and task memory bounded when rows are MBs."""
    total = df.agg(F.sum(size_col)).first()[0] or 0
    n = max(1, int(total / target_bytes))
    return df.repartition(n)


def patch_grid(
    df: DataFrame,
    width_col: str = "meta.width",
    height_col: str = "meta.height",
    patch: int = 8,
) -> DataFrame:
    """ViT-style patch tiling: one row per (patch_x, patch_y) tile of
    each image, with the tile's actual width/height (edge tiles are
    clipped, never padded — padding policy belongs to the model side).
    Pure Spark expressions (sequence + transform + explode): patches
    per image = ceil(w/p)*ceil(h/p), generated executor-side with no
    Python, so tiling 10^9 images is a narrow map stage."""
    from pyspark.sql import functions as F

    w, h, p = F.col(width_col), F.col(height_col), F.lit(patch)
    nx = F.ceil(w.cast("double") / p).cast("int")
    ny = F.ceil(h.cast("double") / p).cast("int")
    tiles = F.explode(
        F.expr(
            f"flatten(transform(sequence(0, int(ceil({width_col}/{patch}.0)) - 1), "
            f"px -> transform(sequence(0, int(ceil({height_col}/{patch}.0)) - 1), "
            "py -> struct(px, py))))"
        )
    ).alias("t")
    out = df.select("*", tiles)
    return out.select(
        "*",
        F.col("t.px").alias("patch_x"),
        F.col("t.py").alias("patch_y"),
        F.least(p, w - F.col("t.px") * p).alias("patch_w"),
        F.least(p, h - F.col("t.py") * p).alias("patch_h"),
    ).drop("t")


def synthesize_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "content",
    gate_every: int = 0,
) -> DataFrame:
    """Materialize REAL 16-bit mono PCM WAV per row: sample count and
    the waveform itself are pure functions of the id (sample i =
    ((id*31 + i*17) % 2003) - 1001), so an analytic oracle can
    recompute every windowed statistic while the pipeline must parse
    them back out of actual RIFF bytes. Audio twin of
    synthesize_media.

    gate_every > 0 zeroes every gate_every-th 32-sample window
    (offset by id) — speech-shaped audio with true silence for the
    segmentation query."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(binary_col, T.BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ice_spark.functions import media

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col]:
                i = int(i)
                n = 64 + i % 128
                samples = [
                    0
                    if gate_every and (j // 32 + i) % gate_every == 0
                    else ((i * 31 + j * 17) % 2003) - 1001
                    for j in range(n)
                ]
                ids.append(i)
                blobs.append(media.synth_wav_pcm(8000, samples))
            yield pd.DataFrame({id_col: ids, binary_col: blobs})

    return df.mapInPandas(run, schema=out_schema)


def audio_window_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "content",
    window: int = 32,
) -> DataFrame:
    """Windowed audio energy over real WAV bytes: decode 16-bit PCM
    samples (functions/media.decode_wav_samples), split into
    fixed-size sample windows, emit one row per window with the
    integer sum of squares. Bytes stay in the Arrow batch; windows of
    a long file are yielded incrementally so a 1 GB track never
    becomes one Python list of rows. At 100 TB the decode is
    embarrassingly parallel map-only work — no shuffle until the
    caller aggregates."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("window_idx", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ice_spark.functions import media

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                i = int(r[id_col])
                samples = media.decode_wav_samples(bytes(r[binary_col]))
                if samples is None:
                    continue
                for w0 in range(0, len(samples), window):
                    chunk = samples[w0 : w0 + window]
                    rows.append(
                        {
                            id_col: i,
                            "window_idx": w0 // window,
                            "n_samples": len(chunk),
                            "energy": sum(s * s for s in chunk),
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "window_idx", "n_samples", "energy"])

    return df.mapInPandas(run, schema=out_schema)


AHASH_IMG = 16  # synthesized pattern image is 16x16, hashed on an 8x8 grid


def synthesize_pattern_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per row: a REAL 16x16 grayscale-pattern PNG whose pixel values
    are the pure function v(x, y) = (13*(id % 25) + 8*x + 3*y) % 256 —
    so an oracle can recompute every pixel analytically while this
    side round-trips actual encoded bytes. Arrow-batched."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("content", T.BinaryType())])

    def run(batches: Iterator) -> Iterator:
        from ice_spark.functions.media import encode_png

        for pdf in batches:
            contents = []
            for did in pdf[id_col]:
                base = 13 * (int(did) % 25)
                rows = [
                    [((base + 8 * x + 3 * y) % 256,) * 3 for x in range(AHASH_IMG)]
                    for y in range(AHASH_IMG)
                ]
                contents.append(encode_png(rows))
            pdf = pdf.copy()
            pdf["content"] = contents
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def perceptual_ahash(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Average-hash over REAL decoded PNG bytes: 8x8 grid of 2x2-block
    sums, bit k set iff 64 * cell_sum > total_sum (integer compare —
    no float mean, so any engine agrees exactly), emitted as four
    16-bit band integers plus the 16-hex-digit hash. Cell index
    k = 8*cy + cx, band = k div 16, bit = k mod 16; hash string is
    band3..band0. Brightness-invariant by construction (a constant
    offset adds equally to both sides of the compare)."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("band0", T.LongType()),
            T.StructField("band1", T.LongType()),
            T.StructField("band2", T.LongType()),
            T.StructField("band3", T.LongType()),
            T.StructField("hash_hex", T.StringType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        from ice_spark.functions.media import decode_png

        for pdf in batches:
            cols = {"band0": [], "band1": [], "band2": [], "band3": [], "hash_hex": []}
            for data in pdf[binary_col]:
                w, h, nch, raw = decode_png(bytes(data))
                assert w == AHASH_IMG and h == AHASH_IMG
                # channel 0 (the pattern is grayscale replicated to RGB)
                px = [
                    [raw[(y * w + x) * nch] for x in range(w)] for y in range(h)
                ]
                cell = [
                    px[2 * cy][2 * cx]
                    + px[2 * cy][2 * cx + 1]
                    + px[2 * cy + 1][2 * cx]
                    + px[2 * cy + 1][2 * cx + 1]
                    for cy in range(8)
                    for cx in range(8)
                ]  # index k = 8*cy + cx
                total = sum(cell)
                bands = [0, 0, 0, 0]
                for k, cs in enumerate(cell):
                    if 64 * cs > total:
                        bands[k // 16] |= 1 << (k % 16)
                for i in range(4):
                    cols[f"band{i}"].append(bands[i])
                cols["hash_hex"].append(
                    f"{bands[3]:04x}{bands[2]:04x}{bands[1]:04x}{bands[0]:04x}"
                )
            pdf = pdf.copy()
            for c, v in cols.items():
                pdf[c] = v
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def synthesize_video(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "content"
) -> DataFrame:
    """Materialize REAL VID0 containers per row (functions/media):
    fps = 10 + id%20, frame grid 4+id%5 x 4+(id//2)%5, n_frames =
    4 + id%12, frame f's luma = (id*7 + f*13) % 256 — all pure
    functions of the id so an analytic oracle can recompute every
    downstream statistic while the pipeline must demux actual bytes.
    Video sibling of synthesize_media / synthesize_audio."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(binary_col, T.BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ice_spark.functions import media

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf[id_col]:
                i = int(i)
                lumas = [(i * 7 + f * 13) % 256 for f in range(4 + i % 12)]
                ids.append(i)
                blobs.append(
                    media.synth_video(10 + i % 20, 4 + i % 5, 4 + (i // 2) % 5, lumas)
                )
            yield pd.DataFrame({id_col: ids, binary_col: blobs})

    return df.mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "content",
    stride: int = 2,
) -> DataFrame:
    """Demux VID0 bytes and emit every stride-th frame as a row
    (id, fps, n_frames, frame_idx, luma). The real frame-sampling
    shape for video training data: map-only Arrow-batched demux, no
    shuffle until the caller aggregates; a corrupt container yields
    no rows rather than poisoning the batch."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("fps", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("luma", T.LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ice_spark.functions import media

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                v = media.parse_video(bytes(r[binary_col]))
                if v is None:
                    continue
                for fi in range(0, v["n_frames"], stride):
                    rows.append(
                        {
                            id_col: int(r[id_col]),
                            "fps": v["fps"],
                            "n_frames": v["n_frames"],
                            "frame_idx": fi,
                            "luma": v["lumas"][fi],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "fps", "n_frames", "frame_idx", "luma"],
            )

    return df.mapInPandas(run, schema=out_schema)
