from biodata_pipeline_spark.streaming.ingest import (
    read_events_stream,
    run_available_now,
)
from biodata_pipeline_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
)
from biodata_pipeline_spark.streaming.stateful import (
    dedup_within_watermark,
    running_user_totals,
    split_late,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "running_user_totals",
    "split_late",
]
