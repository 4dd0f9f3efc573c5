"""Physical-plan inspection helpers.

Used by tests to assert scale-critical plan properties instead of
eyeballing ``explain`` output: filters actually pushed to the parquet
scan, small dims actually broadcast, no accidental extra shuffles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of distinct exchanges in the physical plan (AQE may collapse
    more at runtime; this is the static upper bound). Counts the detail
    headers ``(n) Exchange`` so the tree summary line isn't double-counted;
    ``ReusedExchange`` nodes are free and excluded."""
    return len(re.findall(r"^\(\d+\) Exchange\b", formatted_plan(df), re.M))


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def is_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)
