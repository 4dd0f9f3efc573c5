"""Power-iteration PCA: known-answer recovery, determinism, edge cases."""

from __future__ import annotations

import math

import pytest

from biodata_pipeline_spark.operators.pca import (
    mean_vector,
    power_iteration_fit,
    project_pc1,
    seed_vector,
)


def test_seed_vector_is_unit_norm_and_deterministic():
    v1, v2 = seed_vector(), seed_vector()
    assert v1 == v2
    assert abs(math.fsum(x * x for x in v1) - 1.0) < 1e-12


def _line_df(spark, direction, ts):
    """Rank-1 data: x_i = t_i * direction (64-dim)."""
    rows = [
        (i, [t * d for d in direction]) for i, t in enumerate(ts)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_power_iteration_recovers_a_line(spark):
    # unit direction concentrated on two axes; exact rank-1 input means
    # one step already lands on ±direction (up to the grain rounding)
    d = [0.0] * 64
    d[3], d[17] = 0.6, 0.8
    ts = [-3.0, -1.0, 0.5, 2.0, 4.0]
    df = _line_df(spark, d, ts)
    mu, v = power_iteration_fit(df, dim=64)
    dot = sum(a * b for a, b in zip(v, d))
    assert abs(abs(dot) - 1.0) < 1e-4  # v ≈ ±d
    out = {r.vec_id: r.pc1 for r in project_pc1(df, mu, v).collect()}
    tbar = sum(ts) / len(ts)
    sign = 1.0 if dot > 0 else -1.0
    for i, t in enumerate(ts):
        assert out[i] == pytest.approx(sign * (t - tbar), abs=1e-3)


def test_mean_vector_matches_plain_average(spark):
    df = _line_df(spark, [1.0] + [0.0] * 63, [1.0, 2.0, 6.0])
    mu = mean_vector(df)
    assert mu[0] == pytest.approx(3.0)
    assert mu[1] == 0.0


def test_fit_is_deterministic_across_runs(spark, sf_dir):
    from biodata_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = power_iteration_fit(emb)
    b = power_iteration_fit(emb)
    assert a == b  # bit-identical: same folds, same rounding


def test_empty_input_raises(spark):
    df = _line_df(spark, [1.0] * 64, [1.0]).filter("vec_id > 99")
    with pytest.raises(ValueError, match="empty"):
        power_iteration_fit(df)


def test_degenerate_corpus_keeps_seed(spark):
    # every row equals the mean ⇒ power step is the zero vector ⇒ the
    # fit must fall back to the seed instead of dividing by zero
    df = _line_df(spark, [1.0] * 64, [2.0, 2.0, 2.0])
    _, v = power_iteration_fit(df)
    assert v == seed_vector()
