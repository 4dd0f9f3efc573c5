"""Structured Streaming ingest — the reference's poll loop, declaratively.

Reference: ``while True: if check_queue(): submit; sleep(15)`` with
skip-if-exists re-drives (train_adapters/create_all_models.py:48-76) —
i.e. at-least-once micro-batches with manual checkpointing-by-filename.

Engine: a file-source stream with ``trigger(availableNow=True)`` drains the
backlog and exits (one "PBS job" worth of work); Spark's checkpoint dir
replaces filename-existence as the processed-offset record; an idempotent
foreachBatch parquet sink + manifest gives the same effectively-exactly-once
result without the qstat machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of parquet event files.

    ``max_files_per_trigger`` is the engine's backpressure knob — the
    declarative replacement for the reference's queue gate (poll qstat,
    hold submissions while ≥N jobs queued, create_all_models.py:6-13,76):
    each micro-batch ingests at most that many files, so a backlog drains
    in bounded steps instead of one giant batch."""
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def run_available_now(
    df: DataFrame,
    checkpoint_dir: str,
    sink: str = "memory",
    query_name: str = "out",
    output_mode: str = "append",
    path: str | None = None,
):
    """Drain everything currently available, then stop (the reference's
    one-job-per-cycle semantics). Returns the finished StreamingQuery."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if sink == "memory":
        writer = writer.format("memory").queryName(query_name)
    else:
        writer = writer.format(sink)
        if path:
            writer = writer.option("path", path)
    q = writer.start()
    q.awaitTermination()
    return q


def run_available_now_idempotent(
    df: DataFrame,
    checkpoint_dir: str,
    path: str,
    manifest,
):
    """Drain the backlog into an idempotent parquet+manifest sink.

    Two independent layers give the exactly-once effect:

    - the stream **checkpoint** skips files whose offsets are committed
      (normal re-drives replay nothing);
    - inside ``foreachBatch``, the **manifest anti-join** drops rows whose
      keys were already sunk, then the append and the mark-done run off
      one materialized frame — so even a LOST checkpoint (or an
      at-least-once replay of a half-committed batch) cannot duplicate
      rows in the sink.

    This is the streaming form of the reference's skip-if-exists re-drive
    (generate_narratives_from_data.py:63-72): filename-existence becomes
    manifest keys, the poll loop becomes availableNow.
    """

    def _batch(batch_df: DataFrame, _batch_id: int) -> None:
        todo = manifest.pending(batch_df).localCheckpoint()
        if todo.isEmpty():
            return
        todo.write.mode("append").parquet(path)
        manifest.mark_done(todo)

    q = (
        df.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
