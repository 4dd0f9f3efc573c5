"""Physical-layout operators — no row semantics, only placement.

The reference's ``group_by_length=True`` batches similar-length sequences
together to cut padding waste (train_adapters/RAG-eval-create_model.py:142).
The distributed analog arranges rows so co-located rows have similar
length: range-partition by length, then sort within each partition. Rows
are unchanged — only their partition assignment and intra-partition order
move, so any downstream per-partition batcher (Arrow batches feeding a
trainer via mapInPandas) sees near-uniform lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def length_batched(
    df: DataFrame, text_col: str = "text", num_partitions: int | None = None
) -> DataFrame:
    """Range-partition by text length + sort within partitions (the
    ``group_by_length`` analog; skew in the length distribution is handled
    by range partitioning's sampled bounds)."""
    length = F.length(F.col(text_col))
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(parts, length).sortWithinPartitions(length)
