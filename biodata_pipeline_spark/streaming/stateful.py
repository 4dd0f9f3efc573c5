"""Stateful streaming: exactly-once dedup, late-row routing, and custom
per-key state — the reference's manual bookkeeping as managed state.

Reference analogs:
 - skip-if-exists filenames = at-least-once delivery deduped by key
   (generate_narratives_from_data.py:63-65) → ``dropDuplicatesWithinWatermark``
   (state-store backed, bounded by the watermark instead of by an
   ever-growing directory listing);
 - "never silently drop" — no-match rows get a sentinel instead of
   disappearing (RAG-eval-test_model.py:145-147) → late rows are split to
   a dead-letter frame rather than silently aged out of window state;
 - the poll-loop's running job counts (create_all_models.py:6-13) →
   per-key running aggregates via ``applyInPandasWithState``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate deliveries of the same key arriving within the
    watermark horizon. State is bounded: a key's entry is dropped once the
    watermark passes it, so this scales to unbounded streams (unlike the
    reference's unbounded output-directory listing)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def split_late(
    df: DataFrame, ts_col: str = "ts", allowed_delay: str = "10 minutes"
) -> tuple[DataFrame, DataFrame]:
    """Split a micro-batch (or any batch frame) into (on_time, late) against
    the batch's own high-water mark minus ``allowed_delay`` — the same
    event-time arithmetic a watermark applies, but the late rows are
    *returned* for dead-letter routing instead of silently dropped.

    Intended inside ``foreachBatch``: write ``on_time`` to the main sink and
    ``late`` to a dead-letter sink (the streaming mirror of the reference's
    sentinel-instead-of-drop rule). The high-water mark is a 1-row
    aggregate broadcast back over the batch — no single-partition window."""
    hwm = df.agg(F.max(F.col(ts_col)).alias("__hwm"))
    bounded = df.crossJoin(F.broadcast(hwm)).withColumn(
        "__late",
        F.col(ts_col) < F.col("__hwm") - F.expr(f"INTERVAL {allowed_delay}"),
    )
    on_time = bounded.filter(~F.col("__late")).drop("__hwm", "__late")
    late = bounded.filter(F.col("__late")).drop("__hwm", "__late")
    return on_time, late


RUNNING_STATE_SCHEMA = "n long, total double"
RUNNING_OUT_SCHEMA = "user_id long, n_events long, sum_value double"


def running_user_totals(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user running (count, sum) across micro-batches — a custom
    stateful operator the built-in window aggs can't express (state
    persists and is emitted every batch, not per window).

    ``applyInPandasWithState``: one state row per user, Arrow-batched
    updates, no timeout (state lives for the query's lifetime; use a
    timeout where keys churn)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_OUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
