"""Windowed streaming aggregations (tumbling / sliding / session) with
watermarks. The same builders run on batch frames (for oracle checks) and
streaming frames — Spark's unified API guarantees identical semantics.

Reference analogs: per-job-cycle batches → tumbling
(create_all_models.py:48-76); overlapping chunk/epoch windows → sliding
(RAG-eval-test_model.py:239-240); job bursts between idle polling →
session (create_all_models.py:76). Late data is never silently dropped in
the reference (no-match rows get a sentinel, RAG-eval-test_model.py:145-147);
the streaming surface mirrors that with a watermark: rows older than the
watermark are excluded from window state — route them via a dead-letter
union in the sink if they must be kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window event count + value sum. Window start exposed as epoch ms
    so results are portable across engines."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping-window event count + value sum (each event lands in
    duration/slide windows)."""
    df = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """True streaming session windows (state-backed). The batch analog with
    identical semantics is operators.sessionize (lag + cumulative sum)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
        )
    )
