"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension surface (SURVEY.md §2.11) — not in the reference, which is
text-only. Convention: a multimodal value is ``STRUCT<mime STRING, uri
STRING, bytes BINARY>``; blob ingestion uses Spark's ``binaryFile`` source
(scan parallelism and predicate pushdown on path/length for free).

The decode step is REAL: PNG decodes via the stdlib codec in
``sources/codecs.py`` (zlib + NumPy unfiltering, all five scanline
filters), baseline JPEG via the same module's JFIF codec (Huffman +
dequant + IDCT + YCbCr, Annex-K tables, 4:4:4/4:2:0), and WAV PCM via
the stdlib ``wave`` module — no Pillow/librosa required. Feature
extraction (:func:`with_image_features`) computes statistics over
actual decoded pixels inside ``mapInPandas`` over Arrow batches —
bounded batch size, typed output schema, pure map with no shuffle,
Python only at the codec boundary — the exact 100 TB execution shape a
Pillow-backed decoder would use. Progressive JPEG stays out of scope
and raises with a clear message.
"""

from __future__ import annotations

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
        F.col("path").endswith(".jpg") | F.col("path").endswith(".jpeg"), "image/jpeg"
    ).when(F.col("path").endswith(".wav"), "audio/wav").when(
        F.col("path").endswith(".avi"), "video/x-msvideo"
    ).otherwise("application/octet-stream")
    return raw.select(
        F.struct(
            mime.alias("mime"), F.col("path").alias("uri"), F.col("content").alias("bytes")
        ).alias("media"),
        F.col("length"),
    )


def decode_image(data: bytes) -> "np.ndarray":
    """Decode image bytes → ``(H, W, C)`` uint8 pixels. PNG and JPEG —
    baseline AND progressive SOF2 — decode for real (stdlib+NumPy codecs
    in ``sources/codecs.py``): zlib unfiltering for PNG, Huffman +
    dequant + IDCT + YCbCr for JFIF (scope documented on
    :func:`codecs.jpeg_decode`)."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (
        _PNG_SIG,
        jpeg_decode,
        png_decode,
    )

    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:2] == b"\xff\xd8":
        return jpeg_decode(data)
    raise ValueError("unrecognized image format (expected PNG or JPEG)")


def decode_audio(data: bytes) -> tuple["np.ndarray", int]:
    """Decode WAV PCM bytes → ``((n, channels) int16 array, sample_rate)``."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import wav_decode

    return wav_decode(data)


def _image_features(data: bytes | None) -> list[float]:
    """Deterministic 32-dim feature vector over REAL decoded pixels:

    ``[h, w, c, lum_mean, lum_std, lum_min, lum_max,
    16 × (4×4 grid-block luminance means), 4 × channel means (0-padded),
    lum p10/p25/p50/p75/p90]``

    Luminance = per-pixel mean across channels. Everything is closed-form
    arithmetic over the pixel array, so a SQL oracle can recompute any of
    it for synthetic images."""
    px = decode_image(data or b"").astype(np.float64)
    h, w, c = px.shape
    lum = px.mean(axis=2)
    feats = [float(h), float(w), float(c),
             float(lum.mean()), float(lum.std()), float(lum.min()), float(lum.max())]
    for iy in range(4):
        for ix in range(4):
            ylo, yhi = (iy * h) // 4, max(((iy + 1) * h) // 4, (iy * h) // 4 + 1)
            xlo, xhi = (ix * w) // 4, max(((ix + 1) * w) // 4, (ix * w) // 4 + 1)
            feats.append(float(lum[ylo:yhi, xlo:xhi].mean()))
    for ch in range(4):
        feats.append(float(px[:, :, ch].mean()) if ch < c else 0.0)
    feats.extend(float(q) for q in np.quantile(lum, [0.1, 0.25, 0.5, 0.75, 0.9]))
    return [float(np.float32(f)) for f in feats]


_FRAME_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def frame_sample(df: DataFrame, media_col: str = "media", n_frames: int = 4) -> DataFrame:
    """Sample N frames per audio/video blob: one input row → N output rows.

    ``audio/wav`` blobs are REALLY decoded (stdlib codec): the sample
    stream splits into N contiguous segments, each re-encoded as a
    standalone playable WAV. ``video/x-msvideo`` (MJPEG AVI) blobs are
    REALLY demuxed (round 8 — ``codecs.avi_decode_mjpeg``): N frames
    sampled evenly across the container, each emitted as a standalone
    decodable JPEG. ``video/mpeg`` blobs are REALLY decoded (round 9 —
    ``codecs.mpeg1_decode_iframes``, ISO 11172-2 I-frames only, exactly
    the keyframe-sampling contract a training-data pipeline needs): N
    I-frames sampled evenly, each re-encoded as a standalone decodable
    PNG; P/B pictures are structurally skipped, never decoded. Modern
    inter-frame codecs (H.264 …) remain genuinely absent, so OTHER
    video (and unknown) blobs keep the deterministic raw-byte-chunk
    fallback — the production execution shape is identical in every
    branch: ``mapInPandas`` fan-out (bounded memory: one blob decoded
    at a time per batch), typed output, no shuffle."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import (
            avi_decode_mjpeg,
            mpeg1_decode_iframes,
            png_encode,
            wav_decode,
            wav_encode,
        )

        for pdf in batches:
            uris, idxs, frames = [], [], []
            for m in pdf[media_col]:
                data = m["bytes"] or b""
                if m["mime"] == "audio/wav":
                    samples, rate = wav_decode(bytes(data))
                    n = samples.shape[0]
                    step = max(n // n_frames, 1)
                    for i in range(n_frames):
                        seg = samples[i * step : (i + 1) * step]
                        uris.append(m["uri"])
                        idxs.append(i)
                        frames.append(wav_encode(seg, rate) if len(seg) else b"")
                elif m["mime"] in ("video/x-msvideo", "video/avi"):
                    all_frames, _meta = avi_decode_mjpeg(bytes(data))
                    n = len(all_frames)
                    # evenly-spaced sample across the container (repeats
                    # when the clip is shorter than n_frames)
                    for i in range(n_frames):
                        uris.append(m["uri"])
                        idxs.append(i)
                        frames.append(all_frames[(i * n) // n_frames])
                elif m["mime"] == "video/mpeg":
                    iframes, _meta = mpeg1_decode_iframes(bytes(data))
                    n = len(iframes)
                    for i in range(n_frames):
                        uris.append(m["uri"])
                        idxs.append(i)
                        frames.append(png_encode(iframes[(i * n) // n_frames]))
                else:
                    step = max(len(data) // n_frames, 1)
                    for i in range(n_frames):
                        uris.append(m["uri"])
                        idxs.append(i)
                        frames.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame({"uri": uris, "frame_idx": idxs, "frame_bytes": frames})

    return df.mapInPandas(sample, schema=_FRAME_SCHEMA)


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """Resize image bytes: real decode → nearest-neighbor resample (pure
    integer index math, platform-deterministic) → PNG re-encode."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import png_encode, resize_nearest

    return png_encode(resize_nearest(decode_image(data), width, height))


def with_image_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Feature-extract multimodal rows: ``mapInPandas`` over Arrow batches,
    REAL pixel decode at the codec boundary (see :func:`_image_features`).

    The execution shape is the production one — per-partition streaming
    over bounded batches, no shuffle, output schema declared up front;
    the only Python in the plan is the codec itself."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            yield pd.DataFrame(
                {
                    "uri": [m["uri"] for m in media],
                    "mime": [m["mime"] for m in media],
                    "n_bytes": [len(m["bytes"] or b"") for m in media],
                    "features": [_image_features(m["bytes"]) for m in media],
                }
            )

    return df.mapInPandas(extract, schema=_FEATURE_SCHEMA)
