"""Hypertable-style cascading time rollups.

A continuous-aggregate hierarchy (raw → minute → hour → day) where each
level aggregates the PREVIOUS level, not the raw events — the TimescaleDB
continuous-aggregate idea expressed relationally. Correct because the
carried aggregates are decomposable: count/sum re-aggregate by sum,
min/max by min/max; averages derive from (sum, count) at read time, never
avg-of-avgs.

At 100 TB the win is the read amortization: the hourly level scans
60-minute rows instead of 3600s of raw events, and each level is
~60× smaller than the one below it. Combined with the manifest pattern
(sources/manifest.py) the levels refresh incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGG_COLS = ("n_events", "sum_value", "min_value", "max_value")


def base_rollup(
    events: DataFrame,
    duration: str = "1 minute",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Finest level: aggregate raw events into fixed windows. Emits the
    decomposable carrier columns (count/sum/min/max) keyed by window start."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("w.start").alias("bucket"), *AGG_COLS)
    )


def rollup_up(level: DataFrame, duration: str) -> DataFrame:
    """Next coarser level from the previous level's carrier columns —
    never touches raw events."""
    return (
        level.groupBy(F.window("bucket", duration).alias("w"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .select(F.col("w.start").alias("bucket"), *AGG_COLS)
    )


def cascade_rollup(
    events: DataFrame,
    durations: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
    ts_col: str = "ts",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """The full hierarchy: ``durations[0]`` from raw, each further level
    from its predecessor. Coarser durations must be multiples of finer
    ones (window alignment), like any hypertable policy."""
    levels: dict[str, DataFrame] = {}
    prev: DataFrame | None = None
    for d in durations:
        prev = (
            base_rollup(events, d, ts_col, value_col)
            if prev is None
            else rollup_up(prev, d)
        )
        levels[d] = prev
    return levels
