"""Declared-query registry: every operator from SURVEY.md §2 as a
(spark_fn, oracle_sql) pair.

``SPARK_QUERIES[name](spark, sf_dir) -> DataFrame`` and
``ORACLE_SQL[name]`` is the equivalent DuckDB SQL over the same parquet
tables. Names without oracle SQL are non-SQL-expressible (approximate /
stateful) and get a rows-only check.

Determinism rules enforced throughout (SURVEY §5.1):
 - every rank/limit has an explicit total-order tie-break;
 - floats are rounded at the output boundary (sums 2dp, ratios/avgs 4dp,
   similarities 6dp; ranking keys at 9dp to collapse ulp noise);
 - timestamps cross the engine boundary as epoch milliseconds
   (Spark ``unix_millis`` ≡ DuckDB ``epoch_ms``: both truncate);
 - no rand(), no wall clock, no row-at-a-time Python UDFs in declared
   queries (Arrow-vectorized kernels allowed only where the numpy math
   reproduces the JVM fold bit-for-bit — see similarity_join_vectorized).
"""

from __future__ import annotations

from biodata_pipeline_spark.registry import (
    analytic,
    relational,
    temporal,
    textops,
    vector,
)

SPARK_QUERIES = {
    **relational.SPARK,
    **temporal.SPARK,
    **vector.SPARK,
    **textops.SPARK,
    **analytic.SPARK,
}

ORACLE_SQL = {
    **relational.ORACLE,
    **temporal.ORACLE,
    **vector.ORACLE,
    **textops.ORACLE,
    **analytic.ORACLE,
}

__all__ = ["SPARK_QUERIES", "ORACLE_SQL"]
