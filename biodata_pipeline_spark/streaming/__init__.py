from biodata_pipeline_spark.streaming.ingest import (
    read_events_stream,
    run_available_now,
)
from biodata_pipeline_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
]
