"""Temporal queries (SURVEY §2: Q16 as-of join, Q28-Q29 windows,
Q35-Q37 streaming-window batch analogs) over the ``events`` table.

Timestamps cross the engine boundary as epoch milliseconds
(``unix_millis`` ≡ DuckDB ``epoch_ms`` — both truncate), sidestepping the
ns→µs parquet truncation caveat (SURVEY §7 risk 5).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.asof import asof_join
from biodata_pipeline_spark.operators.sessionize import session_stats
from biodata_pipeline_spark.sources.tables import load_table
from biodata_pipeline_spark.streaming.windows import sliding_counts, tumbling_counts


def q16_asof_join(spark, sf_dir):
    """Each purchase joined to the same user's most recent prior click
    (strictly earlier) — the checkpoint-resume lookup
    (create_all_models.py:54-58) as a scalable as-of join."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))  # dedupe equal-ts rows deterministically
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=("click_id",),
        allow_exact_matches=False,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.unix_millis("ts_right").alias("click_ms"),
        "click_id",
    )


def q28_lag_prev_event(spark, sf_dir):
    """Per-user previous event timestamp + gap (sequential-chain dependency,
    create_all_models.py:54-58)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ms = F.lag(F.unix_millis("ts")).over(w)
    return e.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        prev_ms.alias("prev_ts_ms"),
        (F.unix_millis("ts") - prev_ms).alias("gap_ms"),
    )


def q29_sliding_frame_avg(spark, sf_dir):
    """3-row moving average of value per user (overlapping-window frame,
    RAG-eval-test_model.py:239-240 analog)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg"),
    )


def q35_tumbling_window(spark, sf_dir):
    """1-hour tumbling window counts (per-job-cycle batches,
    create_all_models.py:48-76)."""
    e = load_table(spark, sf_dir, "events")
    return tumbling_counts(e, "1 hour")


def q35b_cascade_hourly(spark, sf_dir):
    """Hypertable-style cascading rollup: hourly aggregates computed FROM
    minute-level aggregates (never re-scanning raw events) — must equal
    the direct hourly aggregation, which is exactly what the oracle
    computes. Decomposable carriers only (count/sum/min/max)."""
    from biodata_pipeline_spark.operators.rollup import cascade_rollup

    e = load_table(spark, sf_dir, "events")
    hourly = cascade_rollup(e, ("1 minute", "1 hour"))["1 hour"]
    return hourly.select(
        F.unix_millis("bucket").alias("window_start_ms"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        "min_value",
        "max_value",
    )


def q36_sliding_window(spark, sf_dir):
    """1-hour windows sliding every 30 minutes (overlapping chunk/epoch
    windows, RAG-eval-test_model.py:239-240)."""
    e = load_table(spark, sf_dir, "events")
    return sliding_counts(e, "1 hour", "30 minutes")


def q37_session_window(spark, sf_dir):
    """Gap-based sessions (>30 min idle starts a new session) per user —
    batch analog of session_window (poll-loop bursts, create_all_models.py:76)."""
    e = load_table(spark, sf_dir, "events")
    return session_stats(e, gap_minutes=30.0)


SPARK = {
    "q16_asof_join": q16_asof_join,
    "q28_lag_prev_event": q28_lag_prev_event,
    "q29_sliding_frame_avg": q29_sliding_frame_avg,
    "q35_tumbling_window": q35_tumbling_window,
    "q35b_cascade_hourly": q35b_cascade_hourly,
    "q36_sliding_window": q36_sliding_window,
    "q37_session_window": q37_session_window,
}

ORACLE = {
    "q16_asof_join": """
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, ts, max(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id,
               epoch_ms(p.ts) AS purchase_ms,
               epoch_ms(c.ts) AS click_ms,
               c.click_id
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    "q28_lag_prev_event": """
        SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
               lag(epoch_ms(ts)) OVER w AS prev_ts_ms,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q29_sliding_frame_avg": """
        SELECT event_id, user_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg
        FROM events
    """,
    "q35_tumbling_window": """
        SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1
    """,
    "q35b_cascade_hourly": """
        SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events GROUP BY 1
    """,
    "q36_sliding_window": """
        WITH assigned AS (
            SELECT epoch_ms(ts) - (epoch_ms(ts) % 1800000) AS w_start, value FROM events
            UNION ALL
            SELECT epoch_ms(ts) - (epoch_ms(ts) % 1800000) - 1800000 AS w_start, value
            FROM events
        )
        SELECT w_start AS window_start_ms, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM assigned GROUP BY 1
    """,
    "q37_session_window": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, event_id, ts, value,
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               epoch_ms(min(ts)) AS session_start_ms,
               epoch_ms(max(ts)) AS session_end_ms,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM numbered GROUP BY user_id, session_id
    """,
}
