"""Multimodal (image/audio/video) column operators.

Design for 100 TB training-data pipelines: media travels as opaque
`binary` columns with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages so bytes never round-trip through Python
row-at-a-time pickling.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container —
decode bodies are gated behind import-try and fall back to a
clearly-marked deterministic stub (or raise NotImplementedError when
`strict=True`). The Spark-side plumbing — schemas, batch iteration,
partition sizing, UDF signatures — is real and tested.

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
    """binary → + meta struct(width,height,format). Arrow-batched."""
    use_pil = _have_pil()
    if strict and not use_pil:
        raise NotImplementedError("image decoding requires PIL (not in this environment)")

    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", IMAGE_META)])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = []
            for data in pdf[binary_col]:
                b = bytes(data) if data is not None else b""
                if use_pil:  # pragma: no cover - not in this container
                    import io

                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(b))
                    metas.append(
                        {"width": img.width, "height": img.height, "format": img.format.lower()}
                    )
                else:
                    w, h, f = _stub_decode_meta(b)
                    metas.append({"width": w, "height": h, "format": f})
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    binary_col: str = "content",
    feature_col: str = "features",
    dim: int = _FEATURE_DIM,
) -> DataFrame:
    """binary → + array<float> feature vector (Arrow-batched).
    Output plugs directly into operators.similarity ANN."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(feature_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[feature_col] = [
                _stub_features(bytes(d) if d is not None else b"", dim)
                for d in pdf[binary_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """binary → binary resized. STUB: without PIL the bytes pass
    through and the recorded meta is updated — the plumbing (schema,
    batching) is what this exercises."""
    if strict and not _have_pil():
        raise NotImplementedError("resize requires PIL (not in this environment)")

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "meta"]
        + [T.StructField("meta", IMAGE_META)]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = [
                {"width": width, "height": height, "format": "png"} for _ in range(len(pdf))
            ]
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


def repartition_for_media(df: DataFrame, size_col: str, target_bytes: int = 256 * 1024 * 1024):
    """Pre-stage partitioning by cumulative media size, not row count:
    keeps Arrow batches and task memory bounded when rows are MBs."""
    total = df.agg(F.sum(size_col)).first()[0] or 0
    n = max(1, int(total / target_bytes))
    return df.repartition(n)
