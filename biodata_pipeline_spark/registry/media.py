"""Multimodal-column queries: binary payloads + typed metadata.

The reference carries no media, but the north-star training-data pipeline
does (SURVEY extensions); ``operators/multimodal.py`` provides the
binary-column plumbing (Arrow ``mapInPandas`` decode, Catalyst frame
sampling). This module gives that surface a *hard* oracle row: with the
FakeImageCodec, every decoded field is a pure function of the payload
bytes (length / md5 / modular geometry), so DuckDB can recompute the
entire decode from the same ``documents.text`` bytes — the mapInPandas
kernel, Arrow batch shape, and binary encoding are all on the hook.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.multimodal import (
    decode_image_meta,
    documents_as_media,
    frame_sample,
)
from biodata_pipeline_spark.sources.tables import load_table

FRAME_STRIDE = 8


def q_media_inventory(spark, sf_dir):
    """Media inventory: wrap documents as binary payloads, decode through
    the Arrow mapInPandas kernel (FakeImageCodec: geometry is a stable
    function of byte length), emit per-asset metadata. Every column is
    hash-checked against DuckDB recomputing the same byte math."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return decode_image_meta(media, fake=True).select(
        "media_id", "kind", "n_bytes", "checksum", "width", "height", "n_frames"
    )


def q_media_frame_sample(spark, sf_dir):
    """Frame-sampling plan over decoded media: one row per every-8th frame
    index — pure Catalyst (sequence + explode), no Python in the sampling
    step itself (operators/multimodal.py:173)."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    decoded = decode_image_meta(media, fake=True)
    return frame_sample(decoded, every_nth=FRAME_STRIDE).select(
        "media_id", "kind", F.col("frame_idx").cast("int").alias("frame_idx")
    )


SPARK = {
    "q_media_inventory": q_media_inventory,
    "q_media_frame_sample": q_media_frame_sample,
}

# FakeImageCodec geometry (multimodal.py:87-89): n % 640 + 1, n % 480 + 1,
# n % 24 + 1 over the UTF-8 byte length. DuckDB md5() hashes the VARCHAR's
# UTF-8 bytes — identical to Python hashlib.md5(text.encode()).
_DECODE = """
    decoded AS (
        SELECT doc_id AS media_id,
               'image' AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               substr(md5(text), 1, 16) AS checksum,
               CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
               CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER) AS n_frames
        FROM documents
    )
"""

ORACLE = {
    "q_media_inventory": (
        "WITH " + _DECODE + """
        SELECT media_id, kind, n_bytes, checksum, width, height, n_frames
        FROM decoded
    """
    ),
    "q_media_frame_sample": (
        "WITH " + _DECODE + f"""
        SELECT media_id, kind, CAST(s AS INTEGER) AS frame_idx
        FROM decoded, generate_series(0, 23, {FRAME_STRIDE}) AS g(s)
        WHERE s <= n_frames - 1
    """
    ),
}
