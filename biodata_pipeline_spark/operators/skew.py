"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the two cases AQE doesn't cover:
a skewed *aggregation* (one giant group serializes into one task) and a
skewed join where the hot side must meet a replicated build side.

At 100 TB a handful of hot keys (empty-string text, null-ish ids, one
dominant language) routinely carry >1% of all rows each — exactly the
shape these helpers flatten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Per-row salt in [0, buckets): content hash mixed with a positional
    term (``monotonically_increasing_id`` = partition id + in-partition
    index). The positional term is what spreads *fully identical* rows —
    the degenerate hot key this module targets (empty-string text,
    repeated null-ish ids) is often millions of byte-equal rows, which a
    pure content hash would funnel into one salt bucket and one task.

    The salt is an internal routing key only: aggregation partials are
    re-merged over all salts and salted joins replicate the other side
    across every salt value, so ANY assignment yields the same result —
    positional instability across task retries cannot change semantics,
    only which task processes a row."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns], F.monotonically_increasing_id()),
            F.lit(buckets),
        ),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: groupBy(keys + salt)
    computes partial results in ``buckets`` parallel tasks per hot key,
    then a cheap second groupBy(keys) merges the partials.

    ``aggs`` maps output column name → *partial* aggregate expression; the
    merge phase re-aggregates with sum/min/max per the partial's semantics
    — expressed here for the decomposable aggregates (count/sum/min/max);
    averages are derived as sum/count at the end (never avg-of-avgs).
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            (
                F.min(f"__p_{name}")
                if name.startswith("min_")
                else F.max(f"__p_{name}")
                if name.startswith("max_")
                else F.sum(f"__p_{name}")
            ).alias(name)
            for name in aggs
        ]
    )
    return merged


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is modest but
    above the broadcast threshold: salt the skewed side, replicate the
    small side ``buckets``× (explode a literal range), and join on
    (keys + salt) — each hot key's rows spread over ``buckets`` tasks.

    When ``small`` fits the broadcast threshold, plain broadcast beats
    this; when both sides are huge, AQE skew-split on a sort-merge join is
    the right tool. This covers the middle."""
    sk = with_salt(skewed, buckets)
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return sk.join(sm, on + ["__salt"]).drop("__salt")
