"""Scale patterns: salted aggregation/join correctness, bucketed join
co-location (shuffle-free plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.skew import salted_agg, salted_join, with_salt
from biodata_pipeline_spark.plans.inspect import count_shuffles
from biodata_pipeline_spark.sources.bucketing import bucketed_join, write_bucketed


def _skewed_df(spark):
    # one hot key carrying 90% of rows + a long tail
    rows = [("hot", float(i)) for i in range(900)]
    rows += [(f"k{i}", float(i)) for i in range(100)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_df(spark)
    got = {
        r.k: (r.n_rows, round(r.sum_v, 6), r.min_v)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n_rows": F.count("*"),
                "sum_v": F.sum("v"),
                "min_v": F.min("v"),
            },
            buckets=8,
        ).collect()
    }
    expect = {
        r.k: (r.n_rows, round(r.sum_v, 6), r.min_v)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
        )
        .collect()
    }
    assert got == expect


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed_df(spark), buckets=8)
    per_salt = (
        df.filter(F.col("k") == "hot").groupBy("__salt").count().collect()
    )
    assert len(per_salt) == 8  # the hot key's rows land in every bucket
    assert max(r["count"] for r in per_salt) < 900  # no bucket holds it all


def test_salt_spreads_fully_identical_rows(spark):
    """The degenerate hot key is often byte-identical rows (empty text,
    null-ish ids); the positional term in the salt must spread them —
    a pure content hash would put all 800 copies in one bucket/task."""
    df = spark.createDataFrame([("", 0.0)] * 800, ["k", "v"]).repartition(8)
    per_salt = with_salt(df, buckets=8).groupBy("__salt").count().collect()
    assert len(per_salt) > 1
    assert max(r["count"] for r in per_salt) < 800

    # and aggregation through identical-row salting is still exact
    got = salted_agg(
        df, ["k"], {"n_rows": F.count("*"), "sum_v": F.sum("v")}, buckets=8
    ).collect()[0]
    assert got.n_rows == 800 and got.sum_v == 0.0


def test_salted_join_matches_plain_join(spark):
    skewed = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(100)], ["k", "label"]
    )
    got = salted_join(skewed, dim, ["k"], buckets=4)
    assert got.count() == skewed.join(dim, "k").count()
    assert set(got.columns) == {"k", "v", "label"}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.range(0, 1000).select(
            F.col("id").alias("orderkey"), (F.col("id") % 100).alias("qty")
        )
        o = spark.range(0, 500).select(
            F.col("id").alias("orderkey"), (F.col("id") % 3).alias("status")
        )
        write_bucketed(li, "li_bkt", "orderkey", n_buckets=8)
        write_bucketed(o, "o_bkt", "orderkey", n_buckets=8)
        joined = bucketed_join(spark, "li_bkt", "o_bkt", "orderkey")
        assert count_shuffles(joined) == 0  # co-located: no Exchange at all
        assert joined.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")
