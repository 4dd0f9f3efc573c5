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


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
    mode: str = "error",
    zorder: bool = False,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files.

    The maintenance pass every long-running ingest needs — streaming and
    incremental appends (``idempotent_append``, the availableNow sinks)
    accumulate per-microbatch files, and at 100 TB a scan's task count is
    the FILE count, so thousands of kilobyte files turn a 10-second scan
    into a scheduler stall. Partition count comes from the actual on-disk
    byte size (Hadoop ``ContentSummary`` — works on any supported
    filesystem scheme, not just ``file:``), so the output file size
    tracks the target regardless of input fragmentation.

    With ``sort_cols`` the rewrite range-partitions + sorts on those
    columns, so parquet min/max row-group stats become selective for
    downstream predicate pushdown (the poor man's Z-order; the right
    call when one column dominates filters — e.g. doc_id, ship date).

    Returns ``{"files_in", "bytes_in", "files_out"}``.
    """
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    summary = fs.getContentSummary(hpath)
    bytes_in, files_in = summary.getLength(), summary.getFileCount()
    n_out = max(1, math.ceil(bytes_in / target_file_bytes))
    df = spark.read.parquet(src)
    if zorder:
        if not sort_cols or len(sort_cols) != 2:
            raise ValueError(
                "compact_parquet(zorder=True) needs exactly two numeric "
                "sort_cols (the Morton interleave is pairwise)"
            )
        df = z_order_layout(df, sort_cols[0], sort_cols[1], n_out)
    elif sort_cols:
        df = df.repartitionByRange(
            n_out, *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    else:
        # coalesce when shrinking (no shuffle — the whole point of
        # compaction is cheap consolidation); repartition (shuffle) only
        # when the scan yields fewer partitions than n_out, since
        # coalesce can only reduce partition count
        n_read = df.rdd.getNumPartitions()
        df = df.coalesce(n_out) if n_read >= n_out else df.repartition(n_out)
    df.write.mode(mode).parquet(dst)
    # report the file count actually written, not the requested one
    # (empty partitions, or a coalesce floor, can make them differ)
    dpath = jvm.org.apache.hadoop.fs.Path(dst)
    dfs = dpath.getFileSystem(spark._jsc.hadoopConfiguration())
    files_out = sum(
        1
        for st in dfs.listStatus(dpath)
        if st.getPath().getName().endswith(".parquet")
    )
    return {"files_in": files_in, "bytes_in": bytes_in, "files_out": files_out}


def z_value(a, b, bits: int = 16):
    """Morton/Z-order interleave of two bucketed non-negative int columns
    (each < 2**bits): bit i of ``a`` lands at position 2i, of ``b`` at
    2i+1. Pure literal shifts — whole-stage codegen, no UDF."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    a, b = a.cast("long"), b.cast("long")
    return sum(
        (
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        for i in range(bits)
    ).cast("long")


def z_order_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_partitions: int | None = None,
    bits: int = 16,
) -> DataFrame:
    """Z-order clustering on two numeric columns — the multi-column
    completion of ``compact_parquet``'s single-axis sort.

    A single-column sort makes parquet min/max stats selective for ONE
    predicate column and useless for the other; interleaving the two
    columns' bits puts rows that are close in BOTH dimensions into the
    same row groups, so scans filtering on either (or both) columns
    prune row groups (the Delta/Iceberg OPTIMIZE ZORDER layout, built
    from plain Spark ops). Columns are min/max-scaled to ``bits``-bit
    buckets with one tiny aggregate (broadcast back — no second pass),
    then range-partitioned + sorted by the interleaved key. Rows are
    unchanged; only placement moves.
    """
    spark = df.sparkSession
    stats = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    top = (1 << bits) - 1

    def bucket(col, lo, hi):
        # guard degenerate ranges (constant column) to bucket 0
        span = F.when(F.col(hi) > F.col(lo), F.col(hi) - F.col(lo)).otherwise(
            F.lit(1)
        )
        return F.floor(
            (F.col(col) - F.col(lo)).cast("double") / span * top
        ).cast("long")

    parts = num_partitions or spark.sparkContext.defaultParallelism
    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "__z",
        z_value(
            bucket(col_a, "__amin", "__amax"),
            bucket(col_b, "__bmin", "__bmax"),
            bits,
        ),
    )
    return (
        keyed.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__amin", "__amax", "__bmin", "__bmax", "__z")
    )
