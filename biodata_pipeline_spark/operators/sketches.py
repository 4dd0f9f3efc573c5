"""Count-min sketch over a key column, UDF-free.

The sketch is a (d × w) counter table built with one groupBy: each key row
explodes into its d (row, bucket) cells, counts aggregate per cell, and a
point lookup reads the MIN over a key's d cells — an upper bound on the
true frequency with error ≤ εN (w = ⌈e/ε⌉) at confidence 1−δ (d = ⌈ln 1/δ⌉).

At 100 TB the sketch table is d×w rows regardless of input size (heavy-
hitter estimation over trillions of rows in kilobytes of state), merges
across partitions/batches by cell-wise addition (the groupBy does this
for free), and — unlike exact groupBy counts — never skews: every key
spreads over d hashed cells. Complements the built-in HLL
(approx_count_distinct, declared as q_approx_count_distinct) on the
"novel sketch" axis of the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: one row per non-empty (row, bucket) cell."""
    cells = df.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width))
                    for d in range(depth)
                ]
            )
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_lookup(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Estimated frequency per key: min over the key's d cells. Keys absent
    from the data read empty cells → estimate 0 (never negative)."""
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width))
                    for d in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
