"""Sessionization: gap-based session assignment (batch analog of
``session_window``).

Reference analog: job bursts separated by idle queue polling
(train_adapters/create_all_models.py:48-76 — activity gated on a 15 s
poll loop). For batch data the classic lag + cumulative-sum formulation is
used (identical semantics in any SQL engine, hence oracle-checkable); the
streaming surface uses ``F.session_window`` (see streaming/windows.py).

One shuffle (partitionBy user) serves both windows — Catalyst reuses the
exchange since the session-id window and the lag window share
partitioning and ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign a per-user ``session_id`` (1-based, in time order): a new
    session starts when the gap from the previous event exceeds
    ``gap_minutes``."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double")
    new_session = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregates: start/end (epoch ms), event count, value sum."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    aggs = [
        F.unix_millis(F.min(ts_col)).alias("session_start_ms"),
        F.unix_millis(F.max(ts_col)).alias("session_end_ms"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return s.groupBy(user_col, "session_id").agg(*aggs)
