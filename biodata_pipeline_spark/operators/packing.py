"""Sequence packing: assign documents to fixed-token-budget training
sequences (the pre-training "concat and chop" batch-prep step).

Documents are laid end-to-end in a deterministic order within each
packing group; a document's sequence id is its starting token offset
divided by the budget. One window shuffle per group — the group key
(e.g. language, or (language, shard) at 100 TB) bounds how many rows any
task scans, exactly like the reference's per-domain training-file split
(train_adapters/create_all_models_json_data.py:29-41 keeps domains
separate).

This is the offset-based packing used by most LLM data loaders: a
document may straddle two sequences (the chop happens at token
granularity downstream); the engine's job is the deterministic offset
assignment, which is pure window arithmetic — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: Column | str,
    budget: int,
    group_cols: tuple[str, ...] = (),
    order_col: str = "doc_id",
) -> DataFrame:
    """Add ``token_offset`` (tokens before this doc in its group's layout)
    and ``seq_id`` (offset // budget) columns.

    The window is partitioned by ``group_cols`` — at scale, include a
    sharding column so no group exceeds one task's scan budget; packing
    quality is unaffected because sequences never cross groups anyway.
    For an exact GLOBAL layout with no group column at all, use
    ``pack_sequences_global`` (distributed prefix sum).
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(tok).over(w), F.lit(0)).cast("long")
    return df.withColumn("token_offset", offset).withColumn(
        "seq_id", F.floor(F.col("token_offset") / budget).cast("long")
    )


def pack_sequences_global(
    df: DataFrame,
    token_col: Column | str,
    budget: int,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """``pack_sequences`` without the per-group window: EXACT global
    ``token_offset`` / ``seq_id`` over the ``order_col`` order via the
    two-phase distributed prefix sum (operators/sharding.py) — the
    corpus-scale path the per-group window's docstring promises. One
    range shuffle + per-partition windows; no partition ever holds more
    than its slice of rows, at any corpus size."""
    from biodata_pipeline_spark.operators.sharding import ordered_prefix_sum

    tok = token_col if isinstance(token_col, str) else None
    if tok is None:
        raise ValueError("pack_sequences_global needs a column NAME")
    out = ordered_prefix_sum(
        df,
        [order_col],
        tok,
        out_col="token_offset",
        num_partitions=num_partitions,
    )
    return out.withColumn(
        "seq_id", F.floor(F.col("token_offset") / budget).cast("long")
    )
