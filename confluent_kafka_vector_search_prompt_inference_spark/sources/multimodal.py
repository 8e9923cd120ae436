"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension surface (SURVEY.md §2.11) — not in the reference, which is
text-only. Convention: a multimodal value is ``STRUCT<mime STRING, uri
STRING, bytes BINARY>``; blob ingestion uses Spark's ``binaryFile`` source
(scan parallelism and predicate pushdown on path/length for free).

The decode step (real JPEG/WAV decoding) needs codec libraries this
container does not ship, so it is STUBBED: :func:`decode_image_stub` raises
``NotImplementedError`` while :func:`with_fake_image_features` provides a
deterministic fake with the REAL Spark plumbing — ``mapInPandas`` over
Arrow batches, bounded batch size, typed output schema — so the 100 TB
execution shape (pure map, no shuffle, Python only at the codec boundary)
is in place and tested; swapping in Pillow/librosa is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("uri", StringType()),
        StructField("bytes", BinaryType()),
    ]
)

IMAGE_FEATURE_DIM = 32

_FEATURE_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a blob directory as multimodal rows via the ``binaryFile``
    source → ``(media STRUCT<mime,uri,bytes>, length BIGINT)``."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    mime = F.when(F.col("path").endswith(".png"), "image/png").when(
        F.col("path").endswith(".jpg"), "image/jpeg"
    ).when(F.col("path").endswith(".wav"), "audio/wav").otherwise("application/octet-stream")
    return raw.select(
        F.struct(
            mime.alias("mime"), F.col("path").alias("uri"), F.col("content").alias("bytes")
        ).alias("media"),
        F.col("length"),
    )


def decode_image_stub(data: bytes) -> "np.ndarray":
    """Real image decode — requires a codec library absent from this
    container. Plumbing above is real; swap this stub for Pillow:
    ``np.asarray(PIL.Image.open(io.BytesIO(data)))``."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use with_fake_image_features() for the deterministic test path"
    )


def _fake_features(data: bytes | None) -> list[float]:
    """Deterministic stand-in feature extractor: md5-seeded float vector.
    Same bytes → same features, so downstream joins/dedup are testable."""
    if data is None:
        data = b""
    h = hashlib.md5(data).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return [float(x) for x in rng.standard_normal(IMAGE_FEATURE_DIM).astype(np.float32)]


_FRAME_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def frame_sample(df: DataFrame, media_col: str = "media", n_frames: int = 4) -> DataFrame:
    """Sample N frames per video/audio blob: one input row → N output rows.

    Real frame extraction needs codec libraries absent here; the fake
    slices the raw bytes into N deterministic chunks, keeping the
    production execution shape — ``mapInPandas`` fan-out (bounded memory:
    one blob decoded at a time per batch, rows yielded incrementally),
    typed output, no shuffle. Swap the chunker for PyAV/ffmpeg."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            uris, idxs, frames = [], [], []
            for m in pdf[media_col]:
                data = m["bytes"] or b""
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    uris.append(m["uri"])
                    idxs.append(i)
                    frames.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame({"uri": uris, "frame_idx": idxs, "frame_bytes": frames})

    return df.mapInPandas(sample, schema=_FRAME_SCHEMA)


def resize_image_stub(data: bytes, width: int, height: int) -> bytes:
    """Real resize — requires Pillow; see :func:`decode_image_stub`."""
    raise NotImplementedError(
        "image codecs are not available in this environment; the Spark-side "
        "plumbing (frame_sample / with_fake_image_features) is real"
    )


def with_fake_image_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Feature-extract multimodal rows: ``mapInPandas`` over Arrow batches.

    The execution shape is the production one — per-partition streaming over
    bounded batches, no shuffle, output schema declared up front — only the
    innermost decode is fake (see module docstring)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            yield pd.DataFrame(
                {
                    "uri": [m["uri"] for m in media],
                    "mime": [m["mime"] for m in media],
                    "n_bytes": [len(m["bytes"] or b"") for m in media],
                    "features": [_fake_features(m["bytes"]) for m in media],
                }
            )

    return df.mapInPandas(extract, schema=_FEATURE_SCHEMA)
