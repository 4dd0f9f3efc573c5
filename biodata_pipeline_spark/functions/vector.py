"""Vector math over ``array<float>`` columns — UDF-free.

The reference attaches a dense embedding to each chunk and ranks by cosine
similarity (rag_evaluation/RAG-eval-test_model.py:83,130,247-248). Here the
dot product / norm / cosine are built from ``zip_with`` + ``aggregate`` so
they stay JVM-side inside whole-stage codegen — no Python boundary, no
Arrow transfer, and Catalyst can pipeline them with the surrounding joins.
Elements are upcast to double before multiplying so accumulation error is
float64, matching any SQL oracle that computes in DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array<numeric> columns (as double)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns (double)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
