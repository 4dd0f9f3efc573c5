"""Document → overlapping character-window chunks, UDF-free.

The reference explodes each document into 256-char chunks with 100-char
overlap via LangChain's RecursiveCharacterTextSplitter
(rag_evaluation/RAG-eval-test_model.py:239-240). Here the same geometry is
a pure Catalyst expression: ``explode(sequence(0, len-1, stride))`` +
``substring``. No Python boundary, so at 100 TB this is embarrassingly
parallel map work; the explode multiplies rows ~len/stride× but never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    chunk_size: int = 256,
    overlap: int = 100,
) -> DataFrame:
    """Explode documents into overlapping chunks.

    Output: ``id_cols…, chunk_id, chunk_start, chunk_text``. Chunk *i*
    covers characters ``[i*stride, i*stride + chunk_size)`` where
    ``stride = chunk_size - overlap``. Empty documents produce no chunks.

    Invariants (property-tested): every character is covered by ≥1 chunk;
    consecutive chunks overlap by exactly ``overlap`` chars (except a short
    final chunk); concatenating chunk[i][:stride] reconstructs the text.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    text = F.col(text_col)
    # Last chunk starts at the greatest multiple of stride that still leaves
    # unseen characters: floor((len-1)/stride)*stride for len>0.
    starts = F.sequence(
        F.lit(0),
        F.floor((F.length(text) - 1) / stride).cast("int") * stride,
        F.lit(stride),
    )
    return (
        df.filter(F.length(text) > 0)
        .select(
            *[F.col(c) for c in id_cols],
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
            text.alias("__text"),
        )
        .select(
            *id_cols,
            "chunk_id",
            "chunk_start",
            F.substring(F.col("__text"), F.col("chunk_start") + 1, chunk_size).alias(
                "chunk_text"
            ),
        )
    )
