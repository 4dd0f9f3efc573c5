"""Top-principal-component extraction by distributed power iteration,
and the per-vector projection score ("pc1") used by embedding-quality
audits (outlier trimming, whitening checks, SemDeDup-style preprocessing
— Abbas et al. 2023 normalize embeddings before clustering; the dominant
component is the standard first diagnostic on a new embedding corpus).

Spark shape (the kmeans_fit pattern): each power-iteration step
``w = Σ_rows ⟨x−μ, v⟩ (x−μ)`` is ONE hash aggregate producing dim+0
cells — map-side combined partials, so an iteration shuffles 64 doubles
per partition, never data. μ and the iterate v live driver-side between
steps (like MLlib's driver loop); projection is a zero-shuffle map stage
against embedded literals.

Oracle parity (every step unrolled ANSI SQL, the kmeans discipline):
 - the seed vector is data-independent (normalized deterministic
   hyperplane) — embedded as the same float64 literals in both engines;
 - per-row dots are in-order float64 left folds (element_at chain ≡
   DuckDB list_sum(list_transform(range(...)))), bit-identical;
 - per-dimension sums follow round(sum, grain)/count — identical rounded
   operands on both sides, so the normalized iterate stays bit-identical
   through every step (normalization's Σw² is an ascending-dimension
   fold in Python and in SQL alike);
 - power iteration's sign is seed-determined, hence stable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PCA_ITERS = 2
PCA_GRAIN = 6  # per-dimension sums rounded before any division
PCA_DIM = 64


def seed_vector(dim: int = PCA_DIM, seed: int = 777) -> list[float]:
    """Deterministic unit-norm start vector (no RNG, no data dependence —
    the same literals are embedded in the Spark plan and the oracle)."""
    from biodata_pipeline_spark.operators.similarity import _hyperplane

    raw = _hyperplane(dim, seed)
    acc = 0.0
    for x in raw:  # ascending-index fold, mirrored by the SQL oracle
        acc += x * x
    nrm = math.sqrt(acc) or 1.0
    return [x / nrm for x in raw]


def _centered_dot_sql(emb_col: str, mu: list[float], v: list[float]) -> str:
    """⟨x − μ, v⟩ as an explicit left-assoc chain (codegen-able, and the
    same IEEE-754 sequence as the oracle's list fold)."""
    return " + ".join(
        f"((CAST(element_at({emb_col}, {i + 1}) AS DOUBLE) - {float(m)!r}D)"
        f" * {float(w)!r}D)"
        for i, (m, w) in enumerate(zip(mu, v))
    )


def mean_vector(
    df: DataFrame, emb_col: str = "embedding", dim: int = PCA_DIM,
    grain: int = PCA_GRAIN,
) -> list[float]:
    """Per-dimension round(sum, grain)/count — one aggregate, collected
    driver-side."""
    sums = [
        F.expr(
            f"round(sum(CAST(element_at({emb_col}, {i + 1}) AS DOUBLE)), {grain})"
        ).alias(f"s{i}")
        for i in range(dim)
    ]
    r = df.agg(F.count("*").alias("n"), *sums).collect()[0]
    if r["n"] == 0:
        raise ValueError("pca: empty input")
    return [r[f"s{i}"] / r["n"] for i in range(dim)]


def power_iteration_fit(
    df: DataFrame,
    iters: int = PCA_ITERS,
    emb_col: str = "embedding",
    dim: int = PCA_DIM,
    grain: int = PCA_GRAIN,
) -> tuple[list[float], list[float]]:
    """Fit (μ, v̂): ``iters`` power steps of the centered Gram operator.
    Eager: 1 mean aggregate + ``iters`` step aggregates, each shuffling
    only per-partition partials (dim+1 cells)."""
    mu = mean_vector(df, emb_col, dim, grain)
    v = seed_vector(dim)
    for _ in range(iters):
        # per-row projection once in a child project (the aggregate's 64
        # cells all reference __p; inlining the chain would evaluate it
        # per dimension), then dim rounded sums in ONE hash aggregate
        centered = df.select(
            F.expr(_centered_dot_sql(emb_col, mu, v)).alias("__p"),
            F.col(emb_col),
        )
        sums = [
            F.expr(
                f"round(sum(__p * (CAST(element_at({emb_col}, {i + 1})"
                f" AS DOUBLE) - {float(mu[i])!r}D)), {grain})"
            ).alias(f"w{i}")
            for i in range(dim)
        ]
        r = centered.agg(*sums).collect()[0]
        w = [r[f"w{i}"] for i in range(dim)]
        acc = 0.0
        for x in w:  # ascending-index fold, mirrored by the oracle
            acc += x * x
        nrm = math.sqrt(acc)
        if nrm == 0.0:  # degenerate corpus (all rows equal μ): keep seed
            break
        v = [x / nrm for x in w]
    return mu, v


def project_pc1(
    df: DataFrame,
    mu: list[float],
    v: list[float],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    grain: int = PCA_GRAIN,
) -> DataFrame:
    """Per-vector first-component score ⟨x − μ, v̂⟩ (rounded) — a pure
    map stage, zero shuffle."""
    return df.select(
        F.col(id_col),
        F.expr(
            f"round({_centered_dot_sql(emb_col, mu, v)}, {grain})"
        ).alias("pc1"),
    )
