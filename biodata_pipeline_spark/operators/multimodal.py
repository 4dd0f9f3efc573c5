"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
typed metadata struct; decode/resize/frame-sample run as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
environment, so the decode kernels are stubbed: ``decode_image_meta`` with
``fake=True`` (default) derives deterministic metadata from the bytes —
the Spark-side plumbing (schema, batching, partitioning) is real and
tested; with ``fake=False`` it raises NotImplementedError where the codec
call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests: wrap the documents table's text bytes as fake
    image payloads so the binary-column plumbing can be exercised without
    real media files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "width int, height int, n_frames int"
)


def decode_image_meta(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode pass: payload bytes → (dimensions, frame count, checksum).

    ``fake=True`` derives metadata deterministically from the byte length
    and an md5 checksum (no codec dependency); ``fake=False`` marks where a
    real decoder (PIL.Image.open on the buffer) plugs in.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg — not in this environment"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            checksum = payloads.map(
                lambda b: hashlib.md5(b or b"").hexdigest()[:16]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    # deterministic fake geometry: stable functions of size
                    "width": (n_bytes % 640 + 1).astype("int32"),
                    "height": (n_bytes % 480 + 1).astype("int32"),
                    "n_frames": (n_bytes % 24 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(mapper, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 8) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame index — pure Catalyst
    (sequence + explode), no Python; the per-frame pixel decode would slot
    into a downstream mapInPandas exactly like decode_image_meta."""
    return decoded.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Resize pass over decoded media: (payload, geometry) → fixed-size
    payload. ``fake=True`` emits a deterministic truncated/padded byte
    payload standing in for resampled pixels (plumbing-real: Arrow batches
    in, binary column out); ``fake=False`` marks the PIL resize slot."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = target_w * target_h // 64  # fake byte budget per image
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resize requires PIL — not in this environment"
                )
            payloads = pdf["payload"].map(
                lambda b: (b or b"").ljust(target, b"\0")[:target]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": payloads,
                }
            )

    return df.select("media_id", "payload").mapInPandas(mapper, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, rms double, zero_crossings long"
)


def audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract pass for audio payloads: byte stream → (RMS energy,
    zero-crossing count). ``fake=True`` computes both over the raw bytes as
    int8 samples via NumPy (deterministic, codec-free); ``fake=False``
    marks where librosa/ffmpeg decode would plug in."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires librosa/ffmpeg — not available"
                )
            out = {"media_id": [], "n_bytes": [], "rms": [], "zero_crossings": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                samples = np.frombuffer(b or b"\0", dtype=np.int8).astype(np.float64)
                out["media_id"].append(mid)
                out["n_bytes"].append(len(b or b""))
                out["rms"].append(float(np.sqrt(np.mean(samples**2))))
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.sign(samples))))
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        mapper, schema=AUDIO_FEATURES_SCHEMA
    )
