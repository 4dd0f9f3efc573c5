"""Upsert / merge-by-key: latest-version-wins over a keyed union.

The reference's filesystem-as-database overwrites a record by rewriting
its file — path = primary key, newest write wins
(generate_narratives_from_data.py:63-72). Without a table format that
owns MERGE, the engine expresses the same semantics relationally: union
the existing rows with the updates and keep one winner per key by
(version, tie-break) order. One window shuffle on the key; at 100 TB the
union never materializes — both sides stream into the same hash
partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """One row per key: highest version, ties broken by ``tiebreak_col``
    (both descending) so the winner is total-order deterministic."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge ``updates`` into ``existing``: new keys insert, matching keys
    take whichever side carries the higher (version, tie-break)."""
    return latest_by_key(
        existing.unionByName(updates), key_cols, version_col, tiebreak_col
    )
