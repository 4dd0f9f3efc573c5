"""Dataset profiling — the per-column governance summary (row/null/
distinct counts, min/max) every corpus intake step runs before training.

Shape: one small aggregate PER COLUMN, unioned. The union-of-aggregates
formulation deliberately trades one wide scan for N single-column scans:
with columnar storage each branch's parquet scan reads exactly its own
column (ReadSchema is a single field — asserted in tests/test_plans.py),
so total I/O equals the one-pass Expand formulation while each branch
gets map-side partial aggregation and no row multiplication. Distinct
counts are exact (the oracle-checkable choice); at 100 TB swap
``F.approx_count_distinct`` in via ``exact=False`` — same plan, sketch
partials instead of a distinct shuffle.

Min/max are emitted as strings so heterogeneous columns share one
schema; keep profiled columns to string/integral types for cross-engine
parity (float→string formatting differs between engines).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """Long-format profile: one row per column —
    ``(column, n_rows, n_nulls, n_distinct, min_val, max_val)``."""
    if not cols:
        raise ValueError("profile: need at least one column")
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    parts = [
        df.select(c).agg(
            F.lit(c).alias("column"),
            F.count("*").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            distinct(c).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_val"),
            F.max(F.col(c)).cast("string").alias("max_val"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, parts)
