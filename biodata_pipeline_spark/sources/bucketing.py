"""Bucketed tables: co-located fact-to-fact joins with no shuffle.

At 100 TB the lineitem⋈orders join shuffles both fact tables on every
run. Writing both bucketed by the join key (same bucket count) stores
them pre-partitioned: Spark's scan reports the bucketing as an output
partitioning, so the sort-merge join needs NO Exchange on either side —
the shuffle is paid once at write time and amortized over every
subsequent join (the standard warehouse layout for repeated fact joins).

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
catalog, not the parquet files); the default in-memory catalog with a
local warehouse dir is enough — no Hive metastore required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    managed table keyed for future co-located joins."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the plan contains no Exchange — verify with
    ``plans.inspect.count_shuffles`` (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on)
