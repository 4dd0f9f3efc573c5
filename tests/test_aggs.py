"""Exact-decimal vs fast-double aggregation variants: the fast path agrees
with the exact path to float64 relative precision, and the exact path is
partitioning-invariant (the property declared queries rely on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.aggs import dec_avg, dec_sum, fast_avg, fast_sum
from biodata_pipeline_spark.sources.tables import load_table


def test_fast_sum_tracks_exact_sum(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        dec_sum("l_extendedprice").alias("exact"),
        fast_sum("l_extendedprice").alias("fast"),
        dec_avg("l_quantity").alias("exact_avg"),
        fast_avg("l_quantity").alias("fast_avg"),
    ).collect()[0]
    assert abs(row.fast - row.exact) / row.exact < 1e-9
    assert abs(row.fast_avg - row.exact_avg) / row.exact_avg < 1e-9


def test_dec_sum_is_partitioning_invariant(spark, sf_dir):
    """Repartitioning changes float accumulation order (fast path may move
    in ulps) but can never move the decimal-grid sum."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    a = li.repartition(3).agg(dec_sum("l_extendedprice").alias("s")).collect()[0].s
    b = li.repartition(17).agg(dec_sum("l_extendedprice").alias("s")).collect()[0].s
    assert a == b


def test_grain_preserved_exactly(spark):
    # values on a 2dp grid whose float sum is classically inexact
    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)] * 1000, ["v"])
    s = df.agg(dec_sum("v", 2).alias("s")).collect()[0].s
    assert s == 600.0  # exact, no 1e-13 residue
